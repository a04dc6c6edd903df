"""Dataset x strategy accuracy matrix (test_full.rs:92-157 parity).

Every case reconstructs a reference particle fixture with the reference's
exact parameters and asserts:
  - the triangle count lands in the reference's published band
    (test_full.rs generate_test! bands), where one exists;
  - the mesh is closed and manifold (check_mesh_consistency with all
    checks on, like the reference's `test_for_boundary` branch);
  - for both-strategy cases, the global and subdomain pipelines agree on
    vertex/triangle counts in f32 (independent implementations).

On top of the bands, a golden-summary check pins the repo's OWN f64
geometry (vertex/triangle counts, surface area, enclosed volume, bbox) so
perf work can't silently change the reconstruction. Goldens live in
tests/goldens/dataset_matrix.json; regenerate with
`python tests/gen_goldens.py` after an INTENTIONAL geometry change and
review the diff.
"""

import json
import os

import numpy as np
import pytest

import splashsurf_tpu as st
from splashsurf_tpu.io import particles_from_file
from splashsurf_tpu.mesh import check_mesh_consistency

# full tier: the dataset x strategy matrix alone exceeds 25 min on this host
pytestmark = pytest.mark.full

GOLDEN_FILE = os.path.join(os.path.dirname(__file__), "goldens", "dataset_matrix.json")

# (fixture, radius, rel_support, rel_cube, iso, strategies, band, aabb)
# bands: /root/reference/splashsurf_lib/tests/integration_tests/test_full.rs:144-157
CASES = [
    ("bunny_frame_14_7705_particles.vtk", 0.025, 4.0, 0.75, 0.6,
     ("global", "grid"), (60_000, 80_000), None),
    ("pentagonal_hexecontahedron_32286_particles.bgeo", 0.025, 4.0, 0.75, 0.6,
     ("grid",), (550_000, 650_000), None),
    ("hilbert_46843_particles.bgeo", 0.025, 4.0, 0.75, 0.6,
     ("grid",), (360_000, 400_000), None),
    ("hilbert2_7954_particles.vtk", 0.025, 4.0, 1.1, 0.6,
     ("global", "grid"), (90_000, 100_000), None),
    ("octocat_32614_particles.bgeo", 0.025, 4.0, 0.75, 0.6,
     ("grid",), (140_000, 180_000), None),
    ("sailors_knot_19539_particles.vtk", 0.025, 4.0, 1.1, 0.6,
     ("global", "grid"), (40_000, 70_000), None),
    ("free_particles_1000_particles.vtk", 0.5, 4.0, 1.5, 0.45,
     ("global",), (21_000, 25_000), None),
    ("free_particles_125_particles.vtk", 0.5, 4.0, 1.5, 0.45,
     ("global",), (1_500, 1_600), ((-10.0,) * 3, (210.0,) * 3)),
    # no reference band for the cases below: the golden summary pins them
    ("double_dam_break_frame_01_4732_particles.vtk", 0.025, 4.0, 1.1, 0.6,
     ("global", "grid"), None, None),
    ("dam_break_frame_23_24389_particles.bgeo", 0.025, 4.0, 1.1, 0.6,
     ("global",), None, None),
    ("hilbert2_18856_particles.vtk", 0.025, 4.0, 1.1, 0.6,
     ("grid",), None, None),
    ("fluid_250_particles.vtu", 0.025, 4.0, 1.1, 0.6,
     ("global",), None, None),
]

IDS = [c[0].split("_particles")[0] for c in CASES]

# f64 golden-summary subset: small enough to double-run, diverse enough to
# cover both pipelines, BGEO/VTK/VTU inputs and a free-surface case.
GOLDEN_CASES = {
    "bunny_frame_14_7705_particles.vtk",
    "hilbert2_7954_particles.vtk",
    "sailors_knot_19539_particles.vtk",
    "free_particles_1000_particles.vtk",
    "double_dam_break_frame_01_4732_particles.vtk",
    "fluid_250_particles.vtu",
}


def matrix_params(radius, support, cube, iso, strategy, aabb, dtype="float32"):
    kw = dict(iso_surface_threshold=iso, dtype=dtype)
    if aabb is not None:
        kw["particle_aabb"] = st.Aabb3d(
            np.asarray(aabb[0], np.float64), np.asarray(aabb[1], np.float64)
        )
    if strategy == "grid":
        kw["spatial_decomposition"] = st.SpatialDecomposition.UNIFORM_GRID
        # reference integration tests use 64 cubes/dim (test_full.rs:167)
        kw["grid_decomposition"] = st.GridDecompositionParameters(
            64, auto_disable=False
        )
    return st.Parameters.new_relative(radius, support, cube, **kw)


def mesh_summary(mesh):
    v = np.asarray(mesh.vertices, np.float64)
    t = np.asarray(mesh.triangles)
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    cross = np.cross(b - a, c - a)
    area = 0.5 * float(np.linalg.norm(cross, axis=1).sum())
    # divergence-theorem volume; meshes are closed so this is exact
    volume = float(np.einsum("ij,ij->i", a, cross).sum() / 6.0)
    return {
        "num_vertices": int(mesh.num_vertices),
        "num_triangles": int(mesh.num_triangles),
        "area": area,
        "volume": volume,
        "bbox_min": [float(x) for x in v.min(axis=0)],
        "bbox_max": [float(x) for x in v.max(axis=0)],
    }


def reconstruct_case(data_dir, case, strategy, dtype="float32"):
    fixture, radius, support, cube, iso, _, _, aabb = case
    pts = particles_from_file(f"{data_dir}/{fixture}")
    params = matrix_params(radius, support, cube, iso, strategy, aabb, dtype)
    return st.reconstruct_surface(np.asarray(pts, params.np_dtype), params)


@pytest.mark.parametrize("case", CASES, ids=IDS)
class TestDatasetStrategyMatrix:
    def test_band_and_consistency(self, data_dir, case):
        fixture, _, _, _, _, strategies, band, _ = case
        counts = {}
        for strategy in strategies:
            rec = reconstruct_case(data_dir, case, strategy)
            nt = rec.mesh.num_triangles
            if band is not None:
                lo, hi = band
                assert lo < nt < hi, (fixture, strategy, nt, band)
            assert nt > 0
            assert (
                check_mesh_consistency(rec.mesh.vertices, rec.mesh.triangles)
                is None
            ), (fixture, strategy)
            counts[strategy] = (rec.mesh.num_vertices, nt)
        if len(counts) == 2:
            # independent pipelines agree on the discrete surface
            assert counts["global"] == counts["grid"], (fixture, counts)


def load_goldens():
    if not os.path.exists(GOLDEN_FILE):
        pytest.skip("golden file missing; run tests/gen_goldens.py")
    with open(GOLDEN_FILE) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "case",
    [c for c in CASES if c[0] in GOLDEN_CASES],
    ids=[i for c, i in zip(CASES, IDS) if c[0] in GOLDEN_CASES],
)
def test_f64_golden_summary(data_dir, case):
    fixture = case[0]
    goldens = load_goldens()
    assert fixture in goldens, f"no golden for {fixture}; run tests/gen_goldens.py"
    strategy = case[5][0]
    rec = reconstruct_case(data_dir, case, strategy, dtype="float64")
    got = mesh_summary(rec.mesh)
    want = goldens[fixture]
    assert got["num_vertices"] == want["num_vertices"], (fixture, got, want)
    assert got["num_triangles"] == want["num_triangles"]
    # f64 geometry is deterministic on CPU; loose-ish tolerance only to
    # absorb cross-platform libm / reduction-order noise
    assert got["area"] == pytest.approx(want["area"], rel=1e-9)
    assert got["volume"] == pytest.approx(want["volume"], rel=1e-9)
    assert np.allclose(got["bbox_min"], want["bbox_min"], atol=1e-9)
    assert np.allclose(got["bbox_max"], want["bbox_max"], atol=1e-9)
