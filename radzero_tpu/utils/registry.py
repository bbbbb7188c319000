"""Component registries.

The reference instantiates loss/model classes via ``eval(name)``
(exp/cxr_pt/model/modeling.py:88, model/__init__.py:17-20) — a quirk
SURVEY.md §7 flags to fix. Here every pluggable component family
(vision encoders, text encoders, align adapters, losses, image
processors) registers into a named :class:`Registry` and is looked up
by string key.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Any] = {}

    def register(self, key: str, obj: Any = None) -> Callable[[Any], Any] | Any:
        if obj is not None:
            self._entries[key] = obj
            return obj

        def deco(fn):
            self._entries[key] = fn
            return fn

        return deco

    def get(self, key: str) -> Any:
        if key not in self._entries:
            raise KeyError(
                f"Unknown {self.name} component {key!r}; available: {sorted(self._entries)}"
            )
        return self._entries[key]

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(self._entries)

    def keys(self):
        return self._entries.keys()


VISION_ENCODERS = Registry("vision_encoder")
TEXT_ENCODERS = Registry("text_encoder")
ALIGN_ADAPTERS = Registry("align_adapter")
LOSSES = Registry("loss")
IMAGE_PROCESSORS = Registry("image_processor")
