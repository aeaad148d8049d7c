"""Tracing/profiling hooks (ABNET3_PROFILE stage captures)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from abnet3_tpu.profiling import profiling_enabled, stage_trace


def test_stage_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("ABNET3_PROFILE", raising=False)
    assert not profiling_enabled()
    with stage_trace("noop-stage"):
        out = jax.jit(lambda x: x * 2)(jnp.ones((4,)))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))


def test_stage_trace_writes_capture(tmp_path, monkeypatch):
    """ABNET3_PROFILE=<dir> produces a per-stage profiler capture
    (XLA + host timeline, TensorBoard/Perfetto-viewable)."""
    monkeypatch.setenv("ABNET3_PROFILE", str(tmp_path))
    assert profiling_enabled()
    with stage_trace("unit-stage"):
        jax.block_until_ready(jax.jit(lambda x: x @ x)(
            jnp.ones((8, 8))))
    captures = [d for d in os.listdir(tmp_path)
                if d.startswith("unit-stage")]
    assert captures, os.listdir(tmp_path)
    cap_dir = tmp_path / captures[0]
    files = [os.path.join(r, f) for r, _, fs in os.walk(cap_dir)
             for f in fs]
    assert files, "trace capture produced no files"


def test_stage_trace_dirs_unique_same_second(tmp_path, monkeypatch):
    """Two captures of the same stage within one second must land in
    distinct directories (review finding: HHMMSS-only naming collided
    and the second jax trace dump could overwrite the first)."""
    monkeypatch.setenv("ABNET3_PROFILE", str(tmp_path))
    from abnet3_tpu.profiling import stage_trace
    with stage_trace("stage"):
        pass
    with stage_trace("stage"):
        pass
    dirs = [d for d in os.listdir(tmp_path) if d.startswith("stage-")]
    assert len(dirs) == 2 and len(set(dirs)) == 2
