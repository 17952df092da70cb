import numpy as np
import jax.numpy as jnp

from malio_tpu.map import voxel_hash as vh

rng = np.random.default_rng(3)


def make_map(cap=1 << 14, voxel=0.5):
    return vh.create(cap, voxel, jnp.float64)


def brute_knn(pts_map, q, k=5):
    d2 = np.sum((pts_map - q[None]) ** 2, axis=-1)
    idx = np.argsort(d2)[:k]
    return idx, d2[idx]


def test_insert_and_lookup():
    m = make_map()
    pts = jnp.asarray(rng.uniform(-20, 20, size=(500, 3)))
    covs = jnp.full((500,), 0.01)
    m = vh.insert(m, pts, covs, jnp.ones(500, bool))
    keys = vh.voxel_key(m, pts)
    slot, found = vh.lookup(m, keys)
    assert bool(jnp.all(found))
    # each stored point must share the voxel of its key
    stored = m.points[slot]
    np.testing.assert_array_equal(np.asarray(vh.voxel_key(m, stored)), np.asarray(keys))


def test_insert_prefers_lowest_cov():
    m = make_map()
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    # same voxel, three candidates with different covs in one batch + updates
    pts = jnp.asarray([[1.0, 1.0, 1.0], [1.1, 1.1, 1.1], [1.05, 1.0, 1.2]])
    covs = jnp.asarray([0.5, 0.1, 0.3])
    m = vh.insert(m, pts, covs, jnp.ones(3, bool))
    assert int(vh.size(m)) == 1
    slot, found = vh.lookup(m, vh.voxel_key(m, p))
    assert bool(found[0])
    assert float(m.covs[slot[0]]) == 0.1
    np.testing.assert_allclose(m.points[slot[0]], [1.1, 1.1, 1.1])
    # a later lower-cov point replaces it
    m = vh.insert(m, jnp.asarray([[1.2, 1.2, 1.2]]), jnp.asarray([0.05]), jnp.ones(1, bool))
    slot, _ = vh.lookup(m, vh.voxel_key(m, p))
    assert float(m.covs[slot[0]]) == 0.05
    # a higher-cov point does not
    m = vh.insert(m, jnp.asarray([[1.3, 1.3, 1.3]]), jnp.asarray([0.9]), jnp.ones(1, bool))
    slot, _ = vh.lookup(m, vh.voxel_key(m, p))
    assert float(m.covs[slot[0]]) == 0.05


def test_masked_points_not_inserted():
    m = make_map()
    pts = jnp.asarray(rng.uniform(-5, 5, size=(10, 3)))
    mask = jnp.asarray([True] * 5 + [False] * 5)
    m = vh.insert(m, pts, jnp.full((10,), 0.1), mask)
    assert int(vh.size(m)) <= 5


def test_knn_matches_bruteforce():
    m = make_map()
    # a dense-ish surface patch: grid on a plane with jitter, ~1 pt/voxel
    g = np.stack(np.meshgrid(np.arange(-8, 8), np.arange(-8, 8), indexing="ij"), -1)
    pts = np.concatenate([g.reshape(-1, 2) * 0.5, np.zeros((256, 1))], axis=1)
    pts += rng.normal(size=pts.shape) * 0.05
    pts = jnp.asarray(pts)
    m = vh.insert(m, pts, jnp.full((256,), 0.1), jnp.ones(256, bool))
    stored = np.asarray(m.points[np.asarray(m.occupied)])

    queries = jnp.asarray(rng.uniform(-3, 3, size=(50, 2)))
    queries = jnp.concatenate([queries, jnp.zeros((50, 1))], axis=1)
    nn_pts, nn_covs, nn_d2, nn_cnt = vh.knn(m, queries, k=5, radius=1)
    for i in range(50):
        idx, d2 = brute_knn(stored, np.asarray(queries[i]))
        # brute force over stored points; the voxel search is limited to the
        # 27-neighborhood so only compare when all brute-force NN are within
        # the search region (true for this dense patch)
        if np.sqrt(d2[-1]) < 0.5:  # all within one voxel radius
            np.testing.assert_allclose(
                np.sort(np.asarray(nn_d2[i])), np.sort(d2), atol=1e-9
            )
    assert bool(jnp.all(nn_cnt == 5))


def test_knn_sparse_returns_count():
    m = make_map()
    # two points in *different* voxels (same-voxel points dedup by design)
    pts = jnp.asarray([[0.1, 0.1, 0.1], [0.6, 0.1, 0.1]])
    m = vh.insert(m, pts, jnp.full((2,), 0.1), jnp.ones(2, bool))
    _, _, d2, cnt = vh.knn(m, jnp.asarray([[0.2, 0.1, 0.1]]), k=5, radius=1)
    assert int(cnt[0]) == 2


def test_evict_outside_box():
    m = make_map()
    pts = jnp.asarray(rng.uniform(-10, 10, size=(300, 3)))
    m = vh.insert(m, pts, jnp.full((300,), 0.1), jnp.ones(300, bool))
    n0 = int(vh.size(m))
    m = vh.evict_outside(m, jnp.asarray([-5.0, -5.0, -5.0]), jnp.asarray([5.0, 5.0, 5.0]))
    stored = np.asarray(m.points[np.asarray(m.occupied)])
    assert stored.size == 0 or np.all(np.abs(stored) <= 5.0)
    assert int(vh.size(m)) < n0
    # lookups after eviction still resolve surviving keys (deletion-safe probing)
    keys = vh.voxel_key(m, jnp.asarray(stored)) if stored.size else None
    if keys is not None:
        _, found = vh.lookup(m, keys)
        assert bool(jnp.all(found))
    # inserting into evicted space works again
    m2 = vh.insert(m, jnp.asarray([[9.0, 9.0, 9.0]]), jnp.asarray([0.2]), jnp.ones(1, bool))
    _, found = vh.lookup(m2, vh.voxel_key(m2, jnp.asarray([[9.0, 9.0, 9.0]])))
    assert bool(found[0])


def test_reinsert_after_evict_no_duplicates():
    m = make_map()
    p = jnp.asarray([[2.0, 2.0, 2.0]])
    m = vh.insert(m, p, jnp.asarray([0.1]), jnp.ones(1, bool))
    m = vh.evict_outside(m, jnp.asarray([10.0, 10, 10]), jnp.asarray([20.0, 20, 20]))
    assert int(vh.size(m)) == 0
    m = vh.insert(m, p, jnp.asarray([0.2]), jnp.ones(1, bool))
    m = vh.insert(m, p, jnp.asarray([0.3]), jnp.ones(1, bool))
    assert int(vh.size(m)) == 1


def test_high_occupancy_recall():
    """Round-1 regression: query probed 4 slots while insert probed 8, so
    points stored at probe offsets 4-7 were invisible to k-NN at realistic
    load factors. Query/insert now share MAX_PROBE; every stored point must
    be findable by a query at its own location (d2 == 0), and the voxel-
    region 5-NN must agree with brute force, at >= 50% load."""
    cap = 1 << 13
    m = vh.create(cap, 0.5, jnp.float64)
    # ~0.6 * cap distinct voxels
    n = int(cap * 0.6)
    side = int(np.ceil(n ** (1 / 3)))
    g = np.stack(
        np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)[:n]
    pts = g * 0.5 + 0.25 + rng.normal(size=(n, 3)) * 0.05
    m = vh.insert(m, jnp.asarray(pts), jnp.full((n,), 0.1), jnp.ones(n, bool))
    occ = int(vh.size(m))
    load = occ / cap
    assert load >= 0.5, load

    stored = np.asarray(m.points[np.asarray(m.occupied)])
    nn_pts, _, nn_d2, nn_cnt = vh.knn(m, jnp.asarray(stored), k=5, radius=1)
    # self-recall: the query IS a stored point, so the nearest hit is itself
    self_found = np.asarray(nn_d2[:, 0]) < 1e-18
    recall = self_found.mean()
    assert recall >= 0.999, f"self-recall {recall:.4f} at load {load:.2f}"

    # region-restricted brute force agreement on a sample
    skeys = np.floor(stored / 0.5).astype(np.int64)
    sample = rng.choice(occ, size=64, replace=False)
    for qi in sample:
        q = stored[qi]
        qkey = np.floor(q / 0.5).astype(np.int64)
        in_region = np.all(np.abs(skeys - qkey[None]) <= 1, axis=-1)
        region = stored[in_region]
        d2 = np.sort(np.sum((region - q[None]) ** 2, -1))[:5]
        got = np.sort(np.asarray(nn_d2[qi]))[: len(d2)]
        np.testing.assert_allclose(got, d2, atol=1e-9)


def test_insert_overflow_counted():
    """Candidates that cannot claim a slot are dropped and counted."""
    cap = 8
    m = vh.create(cap, 0.5, jnp.float64)
    pts = jnp.asarray(rng.uniform(-50, 50, size=(200, 3)))
    m = vh.insert(m, pts, jnp.full((200,), 0.1), jnp.ones(200, bool))
    assert int(vh.size(m)) <= cap + vh.MAX_PROBE - 1
    assert int(m.n_dropped) > 0
    # dropped + stored covers every distinct offered voxel at most once
    assert int(vh.size(m)) + int(m.n_dropped) >= 8


def test_flatten_extract_points():
    """flatten/extract_points (the ikdtree.flatten dump analog,
    laserMapping.cpp:1016-1022) return exactly the live cells."""
    m = make_map()
    pts = jnp.asarray(rng.uniform(-20, 20, size=(300, 3)))
    covs = jnp.asarray(rng.uniform(0.01, 0.2, size=(300,)))
    m = vh.insert(m, pts, covs, jnp.ones(300, bool))
    fpts, fcovs, occ = vh.flatten(m)
    assert fpts.shape[0] == fcovs.shape[0] == occ.shape[0]
    assert int(occ.sum()) == int(vh.size(m))

    epts, ecovs = vh.extract_points(m)
    assert epts.shape == (int(vh.size(m)), 3)
    # every inserted voxel's stored point appears in the dump
    keys_in = set(map(tuple, np.asarray(vh.voxel_key(m, pts))))
    keys_out = set(map(tuple, np.asarray(vh.voxel_key(m, jnp.asarray(epts)))))
    assert keys_out == keys_in
    # dumped covariances are the per-voxel minima offered
    assert float(ecovs.min()) >= float(np.asarray(covs).min()) - 1e-12
    # after evicting everything the dump is empty
    m2 = vh.evict_outside(m, jnp.asarray([100.0, 100, 100]), jnp.asarray([101.0, 101, 101]))
    e2, _ = vh.extract_points(m2)
    assert e2.shape[0] == 0


def test_box_and_radius_search():
    """Box_Search / Radius_Search analogs (ikd_Tree.h:327-329): fixed-shape
    compaction returns exactly the brute-force member sets."""
    m = make_map()
    pts = np.asarray(rng.uniform(-10, 10, size=(400, 3)))
    m = vh.insert(m, jnp.asarray(pts), jnp.full((400,), 0.1), jnp.ones(400, bool))
    stored, _ = vh.extract_points(m)

    bmin = np.asarray([-3.0, -3.0, -3.0])
    bmax = np.asarray([4.0, 2.0, 5.0])
    bp, bc, bvalid, btotal = vh.box_search(
        m, jnp.asarray(bmin), jnp.asarray(bmax), max_results=512
    )
    want = stored[np.all((stored >= bmin) & (stored <= bmax), axis=-1)]
    got = np.asarray(bp)[np.asarray(bvalid)]
    assert int(btotal) == want.shape[0] == got.shape[0]
    assert set(map(tuple, np.round(got, 6))) == set(map(tuple, np.round(want, 6)))

    center = jnp.asarray([1.0, -2.0, 0.5])
    rp, rc, rvalid, rtotal = vh.radius_search(m, center, 4.0, max_results=512)
    d = np.linalg.norm(stored - np.asarray(center), axis=-1)
    want_r = stored[d <= 4.0]
    got_r = np.asarray(rp)[np.asarray(rvalid)]
    assert int(rtotal) == want_r.shape[0] == got_r.shape[0]
    assert set(map(tuple, np.round(got_r, 6))) == set(map(tuple, np.round(want_r, 6)))

    # overflow: budget smaller than the match count still reports the total
    sp, sc, svalid, stotal = vh.radius_search(m, center, 100.0, max_results=8)
    assert int(stotal) == stored.shape[0]
    assert int(np.asarray(svalid).sum()) == 8
