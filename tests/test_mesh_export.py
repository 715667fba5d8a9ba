import numpy as np
import pytest

from nrhints_tpu.eval.mesh_export import marching_cubes, marching_cubes_to_obj, write_obj


def sphere_grid(res=48, radius=0.5, bounds=1.0):
    x = np.linspace(-bounds, bounds, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return radius - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)  # -sdf: + inside


def test_marching_cubes_sphere_geometry():
    grid = sphere_grid()
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) > 100
    assert len(tris) > 100
    assert tris.min() >= 0 and tris.max() < len(verts)
    # Convert to world coords and check radii ~= 0.5.
    res = grid.shape[0]
    world = verts / (res - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.02)
    assert np.abs(radii - 0.5).max() < 0.05


def test_marching_cubes_watertight_sphere():
    """Every edge of a closed surface must be shared by exactly 2 triangles."""
    grid = sphere_grid(res=24)
    verts, tris = marching_cubes(grid, 0.0)
    from collections import Counter

    edge_count = Counter()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edge_count[(min(a, b), max(a, b))] += 1
    counts = set(edge_count.values())
    assert counts == {2}, f"non-manifold edge counts: {counts}"


def test_marching_cubes_surface_area_sphere():
    grid = sphere_grid(res=64)
    verts, tris = marching_cubes(grid, 0.0)
    res = grid.shape[0]
    world = verts / (res - 1) * 2.0 - 1.0
    v0, v1, v2 = world[tris[:, 0]], world[tris[:, 1]], world[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.25, rtol=0.02)


def test_marching_cubes_empty_grid():
    grid = -np.ones((8, 8, 8), dtype=np.float32)
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_obj_roundtrip(tmp_path):
    grid = sphere_grid(res=16)
    path = tmp_path / "m.obj"
    verts, tris = marching_cubes_to_obj(grid, 0.0, [-1, -1, -1], [1, 1, 1], path)
    text = path.read_text().splitlines()
    v_lines = [l for l in text if l.startswith("v ")]
    f_lines = [l for l in text if l.startswith("f ")]
    assert len(v_lines) == len(verts)
    assert len(f_lines) == len(tris)
    # World rescale puts vertices inside the bounds.
    assert np.abs(verts).max() <= 1.0 + 1e-5
