"""Pipelined sequence reconstruction (reconstruct_sequence).

Frame t+1 dispatch overlaps frame t's deferred mesh pull; every yielded
frame must be identical to a frame-at-a-time run, including when a
speculation plan misses mid-sequence (the redo path).
"""

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.io import particles_from_file

DATA = "/root/reference/data"


def _params():
    return st.Parameters.new_relative(0.025, 4.0, 1.1, iso_surface_threshold=0.6)


def _frames(pts, n, scale=1e-4):
    # small jitters keep every speculation plan valid across frames
    return [
        (pts + np.float32(scale * 0.025 * (k + 1))).astype(np.float32)
        for k in range(n)
    ]


@pytest.fixture(scope="module")
def base_pts():
    pts = particles_from_file(
        f"{DATA}/double_dam_break_frame_26_4732_particles.vtk"
    )
    return np.asarray(pts, np.float32)


class TestReconstructSequence:
    def test_matches_frame_at_a_time(self, base_pts):
        import jax

        frames = [jax.device_put(f) for f in _frames(base_pts, 4)]
        params = _params()
        seq = [r for r in st.reconstruct_sequence(frames, params)]
        assert len(seq) == 4
        for fr, rec in zip(frames, seq):
            assert rec.mesh is not None and rec._pending_mesh is None
            ref = st.reconstruct_surface(fr, params)
            assert rec.mesh.num_vertices == ref.mesh.num_vertices
            assert rec.mesh.num_triangles == ref.mesh.num_triangles
            np.testing.assert_array_equal(rec.mesh.vertices, ref.mesh.vertices)
            np.testing.assert_array_equal(rec.mesh.triangles, ref.mesh.triangles)

    def test_warm_frames_defer(self, base_pts):
        """After warmup, the in-flight frame of the pipeline is actually
        deferred (the overlap exists) — not silently synchronous."""
        import jax

        params = _params()
        frames = [jax.device_put(f) for f in _frames(base_pts, 3)]
        # warm every plan
        st.reconstruct_surface(frames[0], params)
        st.reconstruct_surface(frames[0], params)
        deferred = st.reconstruct_surface(frames[1], params, _defer_pull=True)
        assert deferred._pending_mesh is not None and deferred.mesh is None
        deferred.resolve()
        assert deferred.mesh is not None and deferred.mesh.num_triangles > 0

    def test_mid_sequence_plan_miss_redoes_frame(self, base_pts):
        """A frame whose content bursts past the speculation plans (heavy
        clumping -> raster overflow) must still come back correct."""
        import jax

        params = _params()
        frames = _frames(base_pts, 4)
        burst = frames[2].copy()
        burst[:128] = burst[128]  # 128 coincident particles: overflow burst
        frames[2] = burst
        frames = [jax.device_put(f) for f in frames]
        seq = [r for r in st.reconstruct_sequence(frames, params)]
        ref = st.reconstruct_surface(frames[2], params)
        assert seq[2].mesh.num_vertices == ref.mesh.num_vertices
        assert seq[2].mesh.num_triangles == ref.mesh.num_triangles

    def test_pipeline_disable_env(self, base_pts, monkeypatch):
        import jax

        monkeypatch.setenv("SPLASHSURF_TPU_PIPELINE", "0")
        params = _params()
        frames = [jax.device_put(f) for f in _frames(base_pts, 2)]
        seq = [r for r in st.reconstruct_sequence(frames, params)]
        assert all(r.mesh.num_triangles > 0 for r in seq)
