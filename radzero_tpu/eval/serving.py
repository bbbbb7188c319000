"""Production serving engine: micro-batched zero-shot inference.

The reference has no serving runtime (its quickstart is a single-sample
helper, README.md:60-112). For production deployment this engine wraps
the zero-shot path in a request/response loop designed for TPU:

- requests (image, prompt-set-id) accumulate in a queue and are flushed
  as micro-batches (up to ``max_batch`` or after ``max_delay_ms``), so
  the chip always sees the padded static shape it compiled for;
- prompt sets are registered ahead of time (tokenised once, one compiled
  executable per set);
- host preprocessing runs on a thread pool; device dispatch is
  single-threaded and async (one in-flight batch while the next one is
  being assembled — double buffering);
- the host->device path uploads RESIZED UINT8 and normalises on device
  (``device_normalize=True``, 4x fewer bytes than f32 — XLA fuses the
  rescale into the patch-embed conv); requests may carry raw JPEG bytes,
  decoded+resized by the native C++ library (libjpeg, fused
  decode->resize — native/preproc.cpp) when available.

Each submit returns a Future resolving to
``{"probs": (N,), "similarity_maps": (N, H, W) | None}``.
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import queue
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.eval.geometry import upsample_similarity_map
from radzero_tpu.models.configuration import RadZeroConfig
from radzero_tpu.models.radzero import compute_logits
from radzero_tpu.ops.layers import normalize_pixels


@dataclass
class _Request:
    image: Union[np.ndarray, bytes]  # decoded HWC uint8/float, or JPEG bytes
    origin_hw: Optional[Tuple[int, int]]
    prompt_set: str
    want_maps: str              # "none" | "patch" | "full"
    future: cf.Future


class ServingEngine:
    @classmethod
    def from_bundle(cls, bundle_dir: str, image_processor, tokenizer, **kw):
        """Cold-start from an AOT bundle (eval/export.py): no Python
        model tracing — the serialized StableHLO program is compiled
        directly. The bundle pins max_batch/channels; device_normalize
        follows the bundle's ``from_uint8`` flag."""
        from radzero_tpu.eval.export import load_zero_shot

        runner, meta = load_zero_shot(bundle_dir)
        kw.setdefault("max_batch", meta["batch_size"])
        kw.setdefault("channels", meta.get("channels", 3))
        kw.setdefault("device_normalize", meta.get("from_uint8", False))
        if kw["max_batch"] != meta["batch_size"]:
            raise ValueError(
                f"bundle was exported at batch {meta['batch_size']}, "
                f"got max_batch={kw['max_batch']}"
            )
        return cls(None, None, image_processor, tokenizer, aot_runner=runner, **kw)

    def __init__(
        self,
        params: Optional[dict],
        cfg: Optional[RadZeroConfig],
        image_processor,
        tokenizer,
        *,
        max_batch: int = 16,
        max_delay_ms: float = 5.0,
        dtype=jnp.bfloat16,
        preprocess_threads: int = 8,
        device_normalize: bool = True,
        host_backend: str = "auto",   # "auto" | "native" | "pil"
        channels: int = 3,
        aot_runner=None,
        mesh=None,
        fused_tower: bool = None,
        fast_scale: bool = False,
    ):
        """``device_normalize``: split the image pipeline — host does
        decode+resize to u8 only, device does rescale+normalise (bit-
        identical for Blip-geometry processors, 4x less transfer).
        ``host_backend``: "native" decodes/resizes JPEG bytes in C++
        (torch-bicubic resize semantics — the throughput path); "pil"
        keeps PIL end to end (reference bit-parity); "auto" uses native
        when the library is built.
        ``channels=1``: grayscale upload for single-channel sources
        (CXRs) — 3x fewer host->device bytes; the luma plane is
        broadcast to RGB on device before normalisation. Exact for
        grayscale JPEGs (the Y plane IS the pixel data); requires
        device_normalize.
        ``fused_tower``: Pallas-fused forward-only vision/align layers
        (ops/fused_layer.py) — serving never differentiates. ``None``
        (default) resolves to True on TPU only: on CPU the kernels run
        in interpret mode, orders of magnitude slower than the XLA path.
        ``fast_scale``: opt-in libjpeg DCT-domain scaled decode (1/2..1/8)
        for JPEG-bytes requests whose source is much larger than the
        model size — cuts host decode cost up to ~8x but box-filters the
        downscale, so maps/pointing shift slightly; suitable for
        classification-style serving, keep OFF when similarity maps are
        consumed (same trade as the training loader's default-on flag,
        data/native.py:native_jpeg_loader)."""
        if fused_tower is None:
            fused_tower = jax.default_backend() == "tpu"
        if fused_tower and cfg is not None:
            from radzero_tpu.models.configuration import with_fused_towers

            cfg = with_fused_towers(cfg)
        if cfg is not None:
            from radzero_tpu.models.configuration import resolve_backend_impls

            cfg = resolve_backend_impls(cfg)
        self.cfg = cfg
        self.image_processor = image_processor
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self.dtype = dtype
        self.device_normalize = bool(
            device_normalize
            and hasattr(image_processor, "resize_u8")
            and hasattr(image_processor, "mean")
        )
        if channels not in (1, 3):
            raise ValueError("channels must be 1 or 3")
        if channels == 1 and not self.device_normalize:
            raise ValueError("channels=1 requires device_normalize")
        self.channels = channels
        self.fast_scale = bool(fast_scale)
        self._native = None
        if host_backend in ("auto", "native"):
            from radzero_tpu.data import native

            if native.available():
                self._native = native
            elif host_backend == "native":
                raise RuntimeError("native preprocessing library unavailable")
        self.mesh = mesh
        if aot_runner is not None:
            if mesh is not None:
                raise ValueError("AOT bundles are single-device; mesh unsupported")
            self.params = None
            self._jitted = lambda params, pv, ids, mask: aot_runner(pv, ids, mask)
        else:
            self.params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
            if mesh is not None:
                # multi-chip serving: params replicated, batch sharded on
                # the 'data' axis (same layout as the eval scorer)
                from radzero_tpu.parallel.mesh import replicated_sharding

                self.params = jax.device_put(self.params, replicated_sharding(mesh))
            self._jitted = jax.jit(self._fn)
        self._prompt_sets: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        # one-slot hold for a request whose prompt_set mismatched the
        # batch being assembled: it becomes the NEXT batch's first.
        # Re-enqueuing it at the queue TAIL instead would let sustained
        # traffic of another prompt set starve it indefinitely (only
        # _collect, a single thread, touches this slot).
        self._held: Optional[_Request] = None
        self._pool = cf.ThreadPoolExecutor(preprocess_threads)
        self._stop = threading.Event()
        # three-stage pipeline: decode thread -> dispatch thread -> pool
        # resolves; decode of batch i+2 overlaps upload of i+1 and device
        # compute of i
        self._ready: "queue.Queue" = queue.Queue(maxsize=2)
        self._worker = threading.Thread(target=self._run_decode, daemon=True)
        self._dispatcher = threading.Thread(target=self._run_dispatch, daemon=True)
        self._worker.start()
        self._dispatcher.start()

    # ------------------------------------------------------------------
    def _fn(self, params, pixel_values, input_ids, attention_mask):
        if pixel_values.shape[-1] == 1:
            # grayscale upload: broadcast to RGB before the per-channel
            # normalise; XLA fuses both into the patch-embed conv
            pixel_values = jnp.broadcast_to(
                pixel_values, (*pixel_values.shape[:-1], 3)
            )
        if pixel_values.dtype == jnp.uint8:
            pixel_values = normalize_pixels(
                pixel_values, self.image_processor.mean, self.image_processor.std,
                dtype=self.dtype,
            )
        out = compute_logits(
            params, self.cfg, pixel_values, input_ids, attention_mask, dtype=self.dtype
        )
        return out["logits"], out["similarity_scores"]

    def register_prompt_set(self, name: str, prompts: List[str]) -> None:
        ids, mask = self.tokenizer(prompts)
        self._prompt_sets[name] = (jnp.asarray(ids), jnp.asarray(mask))

    def warmup(self, image_hw: Tuple[int, int] = (512, 512)) -> None:
        """Compile every (prompt set x padded batch) executable up front."""
        dummy = np.zeros((*image_hw, 3), np.uint8)
        if self.device_normalize:
            pv = self.image_processor.resize_u8(dummy)[None]
            if self.channels == 1:
                pv = pv[..., :1]
            pv = jnp.asarray(np.repeat(pv, self.max_batch, axis=0))
        else:
            pv = self.image_processor(dummy)["pixel_values"]
            pv = jnp.asarray(np.repeat(pv, self.max_batch, axis=0), self.dtype)
        for ids, mask in self._prompt_sets.values():
            self._jitted(self.params, pv, ids, mask)

    # ------------------------------------------------------------------
    def submit(
        self, image: Union[np.ndarray, bytes], prompt_set: str, want_maps=False
    ) -> cf.Future:
        """``image``: decoded HWC array, or raw JPEG bytes (decoded by
        the native C++ path when built).
        ``want_maps``: False/"none" (probs only), True/"patch"
        (sigmoid maps at patch resolution — cheap, the client can
        upsample), or "full" (maps projected to the original image
        resolution — large responses; prefer "patch" at high request
        rates)."""
        if prompt_set not in self._prompt_sets:
            raise KeyError(f"unknown prompt set {prompt_set!r}")
        if want_maps is True:
            want_maps = "patch"
        elif want_maps is False or want_maps is None:
            want_maps = "none"
        origin_hw = None if isinstance(image, (bytes, bytearray)) else tuple(image.shape[:2])
        if self._stop.is_set():
            raise RuntimeError("engine is closed")
        fut: cf.Future = cf.Future()
        self._queue.put(_Request(image, origin_hw, prompt_set, want_maps, fut))
        if self._stop.is_set():
            # close() may have finished its drain between our check and
            # the put — fail anything still queued (idempotent) so this
            # future can never sit unresolved in a consumer-less queue
            self._fail_queued()
        return fut

    # ------------------------------------------------------------------
    def _collect(self) -> List[_Request]:
        if self._held is not None:
            first, self._held = self._held, None
        else:
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                return []
        batch = [first]
        # Greedy backlog drain: anything ALREADY queued joins the batch
        # immediately — max_delay only bounds waiting for requests that
        # have not arrived yet. Without this, max_delay=0 dispatches
        # batch-1 against a deep backlog (one chip program per request).
        while len(batch) < self.max_batch:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req.prompt_set != first.prompt_set:
                self._held = req  # becomes the next batch's first
                return batch
            batch.append(req)
        deadline = self.max_delay
        import time

        t0 = time.perf_counter()
        while len(batch) < self.max_batch:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req.prompt_set != first.prompt_set:
                self._held = req  # becomes the next batch's first
                break
            batch.append(req)
        return batch

    def _run_decode(self) -> None:
        """Stage 1: micro-batch assembly + host decode/resize."""
        try:
            while not self._stop.is_set():
                batch = self._collect()
                if not batch:
                    continue
                try:
                    imgs = np.stack(list(self._pool.map(self._preprocess, batch)))
                except Exception as e:  # pragma: no cover - fault containment
                    for r in batch:
                        if not r.future.done():
                            r.future.set_exception(e)
                    continue
                self._ready.put((batch, imgs))
        finally:
            self._ready.put(None)  # shutdown sentinel — always sent

    def _run_dispatch(self) -> None:
        """Stage 2: upload + device dispatch; resolves (device sync +
        response assembly) run on the pool one batch behind.

        Exits ONLY on the decode stage's sentinel: breaking on the stop
        flag alone could race a decoded batch into ``_ready`` and leave
        its futures unresolved forever."""
        pending = None  # (batch, device outputs)
        while True:
            try:
                item = self._ready.get(timeout=0.05)
            except queue.Empty:
                if pending is not None:  # idle: flush the in-flight batch
                    self._pool.submit(self._resolve, *pending)
                    pending = None
                continue
            if item is None:
                break
            batch, imgs = item
            try:
                dispatched = self._dispatch(batch, imgs)
            except Exception as e:  # pragma: no cover - fault containment
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            if pending is not None:
                self._pool.submit(self._resolve, *pending)
            pending = (batch, dispatched)
        if pending is not None:  # drain on shutdown
            self._resolve(*pending)

    def _preprocess(self, req: _Request) -> np.ndarray:
        """Host half of the pipeline for one request: decode + resize.
        Returns u8 (device_normalize; (S, S, channels)) or normalised f32."""
        img = req.image
        if isinstance(img, (bytes, bytearray)):
            size = getattr(self.image_processor, "size", None)
            if self._native is not None and size is not None:
                if req.origin_hw is None and req.want_maps == "full":
                    req.origin_hw = self._native.jpeg_dims(bytes(img))
                if self.channels == 1:
                    return self._native.decode_resize_gray_u8(
                        bytes(img), size, size, fast_scale=self.fast_scale
                    )
                u8 = self._native.decode_resize_u8(
                    bytes(img), size, size, fast_scale=self.fast_scale
                )
                if self.device_normalize:
                    return u8
                return self.image_processor(u8)["pixel_values"][0]
            from PIL import Image

            pil = Image.open(io.BytesIO(img))
            if req.origin_hw is None:
                req.origin_hw = (pil.height, pil.width)
            img = pil
        if self.device_normalize:
            if self.channels == 1:
                from PIL import Image

                if isinstance(img, np.ndarray):
                    img = Image.fromarray(img)
                size = self.image_processor.size
                gray = img.convert("L").resize((size, size), Image.Resampling.BICUBIC)
                return np.asarray(gray, np.uint8)[..., None]
            return self.image_processor.resize_u8(img)
        return self.image_processor(img)["pixel_values"][0]

    def _dispatch(self, batch: List[_Request], imgs: np.ndarray):
        n = len(imgs)
        if n < self.max_batch:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], self.max_batch - n, axis=0)], axis=0
            )
        ids, mask = self._prompt_sets[batch[0].prompt_set]
        pv = jnp.asarray(imgs) if imgs.dtype == np.uint8 else jnp.asarray(imgs, self.dtype)
        if self.mesh is not None:
            from radzero_tpu.parallel.mesh import batch_sharding

            pv = jax.device_put(pv, batch_sharding(self.mesh))
        logits, scores = self._jitted(self.params, pv, ids, mask)
        return logits, scores, n

    def _resolve(self, batch: List[_Request], dispatched) -> None:
        try:
            logits, scores, n = dispatched
            logits = np.asarray(logits, np.float32)[:n]
            scores = np.asarray(scores, np.float32)[:n]

            geometry = self.image_processor.geometry
            for i, req in enumerate(batch):
                probs = 1.0 / (1.0 + np.exp(-logits[i]))
                maps = None
                if req.want_maps == "patch":
                    g = int(round(scores.shape[-1] ** 0.5))
                    maps = 1.0 / (1.0 + np.exp(-scores[i].reshape(-1, g, g)))
                elif req.want_maps == "full":
                    maps = upsample_similarity_map(scores[i], req.origin_hw, geometry)
                    maps = 1.0 / (1.0 + np.exp(-maps))
                req.future.set_result({"probs": probs, "similarity_maps": maps})
        except Exception as e:  # pragma: no cover - fault containment
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)

    # ------------------------------------------------------------------
    def close(self) -> None:
        self._stop.set()
        self._worker.join(timeout=5)
        try:  # defensive second sentinel (idempotent); if the queue is
            self._ready.put_nowait(None)  # full the dispatcher is draining
        except queue.Full:  # and will reach the decode stage's sentinel
            pass
        self._dispatcher.join(timeout=15)
        # wait: in-flight _resolve tasks must finish before futures die
        self._pool.shutdown(wait=True)
        # Requests still sitting in the submit queue were never picked up
        # by the (now dead) decode stage — fail their futures so callers
        # (e.g. EngineServer HTTP threads) don't block to their own
        # request_timeout. submit() re-drains after its put when it sees
        # _stop set, so a request racing past this drain is still failed.
        self._fail_queued()

    def _fail_queued(self) -> None:
        # the held slot is only written by the (now joined) decode
        # thread; close() drains it so a held request cannot leak an
        # unresolved future
        held, self._held = self._held, None
        if held is not None and not held.future.done():
            held.future.set_exception(RuntimeError("engine shutting down"))
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(RuntimeError("engine shutting down"))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
        return False
