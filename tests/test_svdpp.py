"""SVD++ vs a single-process numpy reference implementing the pinned
GraphX SVDPlusPlus semantics (same deterministic init, same batch-gradient
iteration, same clamp/bias/implicit-feedback formulas, same final-state
quirks). Allclose tolerance covers float summation-order differences
between the distributed gathers and the reference's add.at."""

import numpy as np
import pandas as pd
import ray.data as rd

from graphx_ray.pipelines.svdpp import init_factors, svdpp

G1, G2, G6, G7 = 0.007, 0.007, 0.005, 0.015
LO, HI = 0.0, 5.0


def _ref(src, dst, r, rank, iters, seed):
    users, items = np.unique(src), np.unique(dst)
    ui, ii = np.searchsorted(users, src), np.searchsorted(items, dst)
    mu = r.mean()
    deg_u = np.bincount(ui, minlength=len(users)).astype(float)
    deg_i = np.bincount(ii, minlength=len(items)).astype(float)
    bu = np.bincount(ui, weights=r, minlength=len(users)) / deg_u - mu
    bi = np.bincount(ii, weights=r, minlength=len(items)) / deg_i - mu
    norm = 1.0 / np.sqrt(deg_u)
    p = init_factors(users, rank, 0, seed)
    usr2 = init_factors(users, rank, 1, seed)
    q = init_factors(items, rank, 0, seed)
    y = init_factors(items, rank, 1, seed)
    for _ in range(iters):
        sumy = np.zeros_like(p)
        np.add.at(sumy, ui, y[ii])
        usr2 = p + norm[:, None] * sumy
        pred = mu + bu[ui] + bi[ii] + np.einsum("ij,ij->i", q[ii], usr2[ui])
        np.clip(pred, LO, HI, out=pred)
        err = r - pred
        upP = q[ii] * (err * G2)[:, None] - p[ui] * (G7 * G2)
        upY = q[ii] * (err * norm[ui] * G2)[:, None] - y[ii] * (G7 * G2)
        upQ = usr2[ui] * (err * G2)[:, None] - q[ii] * (G7 * G2)
        dbu = (err - G6 * bu[ui]) * G1
        dbi = (err - G6 * bi[ii]) * G1
        for mat, idx, up in ((p, ui, upP), (usr2, ui, upY), (q, ii, upQ), (y, ii, upY)):
            d = np.zeros_like(mat)
            np.add.at(d, idx, up)
            mat += d
        for vec, idx, up in ((bu, ui, dbu), (bi, ii, dbi)):
            np.add.at(vec, idx, up)
    pred = mu + bu[ui] + bi[ii] + np.einsum("ij,ij->i", q[ii], usr2[ui])
    np.clip(pred, LO, HI, out=pred)
    err2 = (r - pred) ** 2
    e2_i = np.zeros(len(items))
    np.add.at(e2_i, ii, err2)
    return dict(mu=mu, users=users, items=items, p=p, usr2=usr2, q=q, y=y,
                bu=bu, bi=bi, norm=norm, e2_i=e2_i,
                rmse=float(np.sqrt(err2.sum() / len(r))))


def _ratings(n_users=40, n_items=25, n_edges=600, seed=11):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_users, n_edges).astype(np.int64)
    dst = (rng.integers(0, n_items, n_edges) + 1_000_000).astype(np.int64)
    r = rng.integers(1, 6, n_edges).astype(np.float64)
    return src, dst, r


def _run(src, dst, r, num_parts, rank=4, iters=4, seed=7):
    ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst, "r": r}))
    out, mu, stats = svdpp(ds, rank=rank, max_iters=iters, num_parts=num_parts,
                           seed=seed, min_val=LO, max_val=HI)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    return df, mu, stats


def test_svdpp_matches_reference_oracle():
    src, dst, r = _ratings()
    df, mu, stats = _run(src, dst, r, num_parts=3)
    ref = _ref(src, dst, r, rank=4, iters=4, seed=7)
    assert np.isclose(mu, ref["mu"])
    u = df[df.kind == "user"].reset_index(drop=True)
    i = df[df.kind == "item"].reset_index(drop=True)
    assert (u["vid"].values == ref["users"]).all()
    assert (i["vid"].values == ref["items"]).all()
    assert np.allclose(np.stack(u["f1"].map(np.asarray)), ref["p"], atol=1e-9)
    assert np.allclose(np.stack(u["f2"].map(np.asarray)), ref["usr2"], atol=1e-9)
    assert np.allclose(np.stack(i["f1"].map(np.asarray)), ref["q"], atol=1e-9)
    assert np.allclose(np.stack(i["f2"].map(np.asarray)), ref["y"], atol=1e-9)
    assert np.allclose(u["bias"].values, ref["bu"], atol=1e-9)
    assert np.allclose(i["bias"].values, ref["bi"], atol=1e-9)
    assert np.allclose(u["v4"].values, ref["norm"], atol=1e-12)
    assert np.allclose(i["v4"].values, ref["e2_i"], atol=1e-8)
    assert np.isclose(stats["train_rmse"], ref["rmse"], atol=1e-9)
    # gradient descent actually learns: after the documented init
    # overshoot (random [0,1) factors), error falls below the start point
    r16 = _ref(src, dst, r, rank=4, iters=16, seed=7)["rmse"]
    assert r16 < _ref(src, dst, r, rank=4, iters=0, seed=7)["rmse"]
    assert r16 < ref["rmse"]


def test_svdpp_partition_invariant():
    src, dst, r = _ratings(seed=23)
    df2, _, s2 = _run(src, dst, r, num_parts=2)
    df5, _, s5 = _run(src, dst, r, num_parts=5)
    assert (df2["vid"].values == df5["vid"].values).all()
    assert np.allclose(np.stack(df2["f1"].map(np.asarray)),
                       np.stack(df5["f1"].map(np.asarray)), atol=1e-9)
    assert np.allclose(df2["bias"].values, df5["bias"].values, atol=1e-9)
    assert np.isclose(s2["train_rmse"], s5["train_rmse"], atol=1e-9)


def test_svdpp_fixed_partition_invariant_and_matches_numpy(ray_session):
    """Fixed-point variant: bit-identical across partitionings (integer
    sums are order-free) and equal to a single-process numpy fixed-point
    oracle."""
    import ray.data as rd

    from graphx_ray.pipelines.svdpp import svdpp_fixed, u01_e6

    S = 1_000_000
    rng = np.random.default_rng(9)
    n = 300
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 15, n),
            "dst": 500 + rng.integers(0, 25, n),
            "r": rng.integers(1, 6, n).astype(float),
        }
    )
    outs = {}
    for P in (2, 6):
        outs[P] = (
            svdpp_fixed(rd.from_pandas(df).repartition(4), rank=3, max_iters=2,
                        num_parts=P, seed=7, min_val=1.0, max_val=5.0)
            .to_pandas().sort_values(["kind", "vid"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[2], outs[6])

    # single-process numpy oracle (same pinned integer arithmetic)
    users = np.unique(df.src.to_numpy())
    items = np.unique(df.dst.to_numpy())
    u_of = {v: i for i, v in enumerate(users)}
    i_of = {v: i for i, v in enumerate(items)}
    src = df.src.map(u_of).to_numpy()
    dst = df.dst.map(i_of).to_numpy()
    r = np.rint(df.r.to_numpy() * S).astype(np.int64)
    mu = int(r.sum()) // len(r)
    deg_u = np.bincount(src, minlength=len(users))
    deg_i = np.bincount(dst, minlength=len(items))
    rsum_u = np.bincount(src, weights=r, minlength=len(users)).astype(np.int64)
    rsum_i = np.bincount(dst, weights=r, minlength=len(items)).astype(np.int64)
    bu = rsum_u // deg_u - mu
    bi = rsum_i // deg_i - mu
    nrm = np.floor(S / np.sqrt(deg_u)).astype(np.int64)
    pm = np.stack([u01_e6(users, 0, d, 7) for d in range(3)], axis=1)
    qm = np.stack([u01_e6(items, 0, d, 7) for d in range(3)], axis=1)
    ym = np.stack([u01_e6(items, 1, d, 7) for d in range(3)], axis=1)
    g1, g2, g6 = 7000, 7000, 5000
    g72 = (15000 * 7000) // S
    lo, hi = S, 5 * S
    for _ in range(2):
        sumy = np.zeros_like(pm)
        np.add.at(sumy, src, ym[dst])
        u2 = pm + (nrm[:, None] * sumy) // S
        pred = mu + bu[src] + bi[dst] + np.einsum("ij,ij->i", qm[dst], u2[src]) // S
        np.clip(pred, lo, hi, out=pred)
        err = r - pred
        eg2 = (err * g2) // S
        eng2 = (((err * nrm[src]) // S) * g2) // S
        upP = (qm[dst] * eg2[:, None]) // S - (pm[src] * g72) // S
        upQ = (u2[src] * eg2[:, None]) // S - (qm[dst] * g72) // S
        upY = (qm[dst] * eng2[:, None]) // S - (ym[dst] * g72) // S
        dbu = ((err - (g6 * bu[src]) // S) * g1) // S
        dbi = ((err - (g6 * bi[dst]) // S) * g1) // S
        dP = np.zeros_like(pm); np.add.at(dP, src, upP)
        dQ = np.zeros_like(qm); np.add.at(dQ, dst, upQ)
        dY = np.zeros_like(ym); np.add.at(dY, dst, upY)
        du = np.zeros_like(bu); np.add.at(du, src, dbu)
        di = np.zeros_like(bi); np.add.at(di, dst, dbi)
        pm, qm, ym = pm + dP, qm + dQ, ym + dY
        bu, bi = bu + du, bi + di
    got = outs[2]
    gu = got[got.kind == "user"].set_index("vid")
    gi = got[got.kind == "item"].set_index("vid")
    np.testing.assert_array_equal(gu.loc[users, "bias_e6"].to_numpy(), bu)
    np.testing.assert_array_equal(gi.loc[items, "bias_e6"].to_numpy(), bi)
    for d in range(3):
        np.testing.assert_array_equal(gu.loc[users, f"f{d}_e6"].to_numpy(), pm[:, d])
        np.testing.assert_array_equal(gi.loc[items, f"f{d}_e6"].to_numpy(), qm[:, d])
