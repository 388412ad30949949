"""Utility-layer tests: logging writers, checkpoint helpers, profiling
hooks, and the TimeEncoding legacy block.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from fourierdiffusion_tpu.utils.logging import JsonlWriter, generate_run_id
from fourierdiffusion_tpu.utils.profiling import StepTimer, annotate, trace_if_enabled


def test_jsonl_writer(tmp_path) -> None:
    w = JsonlWriter(tmp_path)
    w.log({"train/loss": 1.0}, step=1)
    w.log({"val/loss": 0.5, "lr": 1e-3}, step=2)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 1.0
    assert lines[0]["_step"] == 1
    assert lines[1]["lr"] == 1e-3


def test_run_id_format() -> None:
    ids = {generate_run_id() for _ in range(50)}
    assert len(ids) == 50  # unique
    assert all(len(i) == 8 for i in ids)


def test_trace_disabled_is_noop() -> None:
    with trace_if_enabled("unit"):
        with annotate("region"):
            x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_step_timer() -> None:
    t = StepTimer()
    assert t.lap() >= 0.0


def test_time_encoding_block() -> None:
    """Legacy discrete-step TimeEncoding (reference transformer.py:32-60):
    adds the looked-up embedding row, broadcast over the sequence axis."""
    from fourierdiffusion_tpu.models.blocks import TimeEncoding

    te = TimeEncoding(d_model=4, max_time=10)
    x = jnp.zeros((2, 5, 4))
    steps = jnp.array([3, 7])
    variables = te.init(jax.random.PRNGKey(0), x, steps)
    out = te.apply(variables, x, steps)
    emb = variables["params"]["embedding"]
    # max_norm renorm only shrinks; with N(0,1) rows of dim 4 vs bound 2
    # most rows are untouched — compare against the renormed row.
    row = np.asarray(emb)[3]
    norm = np.linalg.norm(row)
    expected = row * min(1.0, 2.0 / norm)
    np.testing.assert_allclose(np.asarray(out[0, 0]), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(out[0, 0]))
