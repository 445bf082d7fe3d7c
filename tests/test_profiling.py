"""Profiling utility tests: step timing, metrics logging, trace context."""
import json
import time

from on_device_image_captioning_tpu.utils.profiling import (
    MetricsLogger,
    StepTimer,
    annotate,
)


def test_step_timer_warmup_and_average():
    t = StepTimer(warmup=1)
    t.tick()
    for _ in range(3):
        time.sleep(0.01)
        t.tick()
    assert 0.005 < t.sec_per_iter < 0.1


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path, stdout=False)
    logger.log(1, {"loss": 2.5})
    logger.log(2, {"loss": 2.25, "lr": 1e-4})
    logger.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0] == {"step": 1, "loss": 2.5}
    assert rows[1]["lr"] == 1e-4


def test_annotation_context_runs():
    import jax.numpy as jnp

    with annotate("test-region"):
        assert float(jnp.sum(jnp.ones(3))) == 3.0
