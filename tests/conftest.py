"""Test harness: run the whole engine on a virtual 8-device CPU mesh.

Mirrors the reference's fake-backend seam (test_utils.rs:96-133): tests use
the deterministic fake embedder and CPU JAX so the full engine runs in CI
without TPUs; mesh-parameterized tests exercise the same sharded code paths
that run on a real slice.
"""

import os

# The image's sitecustomize pre-imports jax and registers the axon TPU
# backend (JAX_PLATFORMS=axon) before conftest runs, so setting the env var
# is not enough — force the config back to CPU before any device use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_engine(tmp_path):
    """A full write+read engine on a temp dir with the fake AI backend."""
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "writer")
    cfg.reader_side.data_dir = str(tmp_path / "reader")
    # Huge thresholds: tests control commit timing explicitly
    # (same trick as reference tests.rs:29-70).
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.writer_side.commit_interval_sec = 3600.0
    cfg.reader_side.commit_interval_sec = 3600.0
    cfg.ai.backend = "fake"
    engine = build_orama(cfg, start_background=False)
    yield engine
    engine.close()
