"""Accel construction helpers (CPU): Morton ordering + cluster AABBs
(ref: SURVEY §7 LBVH-style leaf ordering; accel/pallas_trace.py)."""


def test_morton_order_properties():
    """Morton ordering (builder.morton_order): valid permutation and
    spatially tighter trace clusters on a shuffled soup (CPU-safe)."""
    import numpy as np

    from mitsuba_tpu.accel.pallas_trace import build_cluster_aabbs
    from mitsuba_tpu.scene.builder import morton_order

    rng = np.random.default_rng(0)
    # 2048 tiny triangles scattered in a cube, in random order
    p0 = rng.uniform(0, 10, (2048, 3))
    e1 = rng.normal(0, 0.05, (2048, 3))
    e2 = rng.normal(0, 0.05, (2048, 3))
    order = morton_order(p0, e1, e2)
    assert sorted(order.tolist()) == list(range(2048))

    def total_volume(p0s, e1s, e2s):
        a = build_cluster_aabbs(p0s, e1s, e2s, 64, 32)
        ext = np.maximum(a[:, 3:6] - a[:, 0:3], 0.0)
        return float(np.prod(ext, axis=-1).sum())

    v_rand = total_volume(p0, e1, e2)
    v_sorted = total_volume(p0[order], e1[order], e2[order])
    # shuffled clusters nearly span the whole cube each; Morton clusters
    # must be dramatically tighter
    assert v_sorted < 0.25 * v_rand, (v_sorted, v_rand)
