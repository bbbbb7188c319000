"""The bench record must assemble + serialize even with the nested e2e
blocks (unloaded latency + max_delay sweep, VERDICT r3 #5).

Regression for a round-4 bug: ``main()`` rounded the e2e record with a
flat ``round(v, 2)`` over its values; once ``bench_end_to_end`` grew
nested dicts, that raised TypeError BEFORE the headline JSON printed —
the driver would have recorded an empty BENCH_r04.
"""

import json

import bench


def test_round_tree_handles_nested_e2e_record():
    e2e = {
        "imgs_per_sec": 100.63217,
        "host_cores": 1,
        "imgs_per_sec_max": 101.7777,
        "request_latency_p50_ms": 1985.234,
        "request_latency_p99_ms": 2510.999,
        "e2e_unloaded_latency": {
            "maps_p50_ms": 123.4567,
            "maps_p95_ms": 150.01,
            "probs_only_p50_ms": 90.113,
            "probs_only_p95_ms": 110.0,
        },
        "max_delay_sweep": {
            "0ms": {
                "unloaded_p50_ms": 123.4567,
                "unloaded_p95_ms": 150.01,
                "saturated_imgs_per_sec": 98.7654,
            },
            "5ms": {
                "unloaded_p50_ms": 128.0,
                "unloaded_p95_ms": 155.5,
                "saturated_imgs_per_sec": 100.1,
            },
        },
    }
    rounded = bench._round_tree(e2e)
    assert rounded["imgs_per_sec"] == 100.63
    assert rounded["e2e_unloaded_latency"]["maps_p50_ms"] == 123.46
    assert rounded["max_delay_sweep"]["0ms"]["saturated_imgs_per_sec"] == 98.77
    assert rounded["host_cores"] == 1  # ints pass through untouched
    # and the whole record must be JSON-serializable as the driver expects
    json.dumps({"extra": {"e2e_serving_jpeg1024": rounded}})
