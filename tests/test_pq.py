"""Product quantization: numpy differential for encode, codebook
self-coding, ADC recall sanity, and the map-only plan claim."""

from __future__ import annotations

import numpy as np

from prajna_spark.pipeline.pq import pq_adc_recall, pq_codebook, pq_encode


def _emb_df(spark, n=60, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def test_encode_matches_numpy(spark):
    df, vecs = _emb_df(spark, n=60, dim=16)
    m, k, sub = 4, 8, 4
    cb = pq_codebook(df, dim=16, m=m, k=k)
    got = {r.vec_id: (list(r.codes), r.recon_err) for r in pq_encode(df, cb).collect()}
    cbn = np.array(cb)  # (m, k, sub)
    for i in range(60):
        want_codes, err = [], 0.0
        for s in range(m):
            d = ((vecs[i, s * sub : (s + 1) * sub] - cbn[s]) ** 2).sum(axis=1)
            c = int(np.argmin(d))
            want_codes.append(c)
            err += float(d[c])
        codes, recon = got[i]
        assert codes == want_codes, f"vec {i}"
        assert abs(recon - err) < 1e-6


def test_codebook_vectors_self_code(spark):
    df, _ = _emb_df(spark, n=40, dim=16)
    cb = pq_codebook(df, dim=16, m=4, k=8)
    enc = {r.vec_id: r for r in pq_encode(df, cb).collect()}
    # the 8 lowest-id vectors ARE the codebook: they code to themselves
    # in every subspace with zero reconstruction error
    for i in range(8):
        assert list(enc[i].codes) == [i] * 4
        assert enc[i].recon_err == 0.0


def test_adc_recall_bounds_and_self_consistency(spark):
    df, _ = _emb_df(spark, n=60, dim=16)
    cb = pq_codebook(df, dim=16, m=4, k=8)
    out = pq_adc_recall(df, cb, n_queries=5, k=5).collect()
    assert len(out) == 5
    for r in out:
        assert 0 <= r.n_overlap <= 5
        assert abs(r.recall - r.n_overlap / 5) < 1e-9


def test_trained_codebook_matches_numpy_lloyd(spark):
    """pq_codebook_trained == a local per-subspace Lloyd replay with the
    same deterministic init, argmin tie-break (lowest code id), portable
    per-iteration mean rounding, and empty-code carry-over."""
    from prajna_spark.pipeline.pq import pq_codebook_trained

    df, vecs = _emb_df(spark, n=60, dim=16, seed=7)
    m, k, sub, n_iter, dec = 4, 8, 4, 3, 6
    got = pq_codebook_trained(df, dim=16, m=m, k=k, n_iter=n_iter, round_decimals=dec)

    def pround_np(x):
        return np.floor(x * 10**dec + 0.5) / 10**dec

    book = np.array(
        [[vecs[c, s * sub : (s + 1) * sub] for c in range(k)] for s in range(m)]
    )
    for _ in range(n_iter):
        new = book.copy()
        for s in range(m):
            x = vecs[:, s * sub : (s + 1) * sub]
            d = ((x[:, None, :] - book[s][None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # np.argmin ties -> first == lowest cid
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    new[s][c] = pround_np(members.mean(axis=0))
        book = new
    for s in range(m):
        for c in range(k):
            assert np.allclose(got[s][c], book[s][c], atol=1e-12), (s, c)


def test_trained_codebook_lowers_reconstruction_error(spark):
    from prajna_spark.pipeline.pq import pq_codebook_trained
    from pyspark.sql import functions as F

    df, _ = _emb_df(spark, n=80, dim=16, seed=3)
    seeded = pq_codebook(df, dim=16, m=4, k=8)
    trained = pq_codebook_trained(df, dim=16, m=4, k=8, n_iter=3)
    err = {
        name: pq_encode(df, cb).agg(F.sum("recon_err")).collect()[0][0]
        for name, cb in (("seeded", seeded), ("trained", trained))
    }
    assert err["trained"] < err["seeded"], err


def test_encode_plan_is_map_only(spark):
    df, _ = _emb_df(spark, n=30, dim=16)
    cb = pq_codebook(df, dim=16, m=4, k=8)
    plan = pq_encode(df, cb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_ivf_pq_matches_local_model(spark):
    from prajna_spark.pipeline.pq import ivf_pq_search

    df, vecs = _emb_df(spark, n=80, dim=16, seed=4)
    m, k_codes, sub = 4, 8, 4
    cb = pq_codebook(df, dim=16, m=m, k=k_codes)
    centroids = [(c, [x for s in range(m) for x in cb[s][c]]) for c in range(k_codes)]
    got = {}
    for r in ivf_pq_search(
        df, cb, centroids, n_queries=3, nprobe=2, k=4
    ).collect():
        got.setdefault(r.query_id, []).append((r.rk, r.neighbor_id, r.d_adc))

    cbn = np.array(cb)  # (m, k, sub)
    cent = np.array([v for _, v in centroids])  # (k, dim)

    def codes_of(x):
        return [
            int(np.argmin(((x[s * sub : (s + 1) * sub] - cbn[s]) ** 2).sum(axis=1)))
            for s in range(m)
        ]

    cells = {i: int(np.argmin(((vecs[i] - cent) ** 2).sum(axis=1))) for i in range(80)}
    for q in range(3):
        probed = np.argsort(((vecs[q] - cent) ** 2).sum(axis=1), kind="stable")[:2]
        cand = [
            i for i in range(80) if cells[i] in set(int(p) for p in probed) and i != q
        ]
        scored = []
        for i in cand:
            cs = codes_of(vecs[i])
            d = sum(
                ((vecs[q][s * sub : (s + 1) * sub] - cbn[s][cs[s]]) ** 2).sum()
                for s in range(m)
            )
            scored.append((np.floor(d * 1e6 + 0.5) / 1e6, i))
        want = [
            (rk + 1, i, d) for rk, (d, i) in enumerate(sorted(scored)[:4])
        ]
        have = sorted(got.get(q, []))
        assert [(rk, i) for rk, i, _ in have] == [(rk, i) for rk, i, _ in want], q
        for (_, _, da), (_, _, dw) in zip(have, want):
            assert abs(da - dw) < 1e-9


def test_enc_struct_tie_breaks_to_lowest_code(spark):
    # r12 single-traversal fold: on EXACT distance ties the first (lowest)
    # code must win — the contract the array_position(array_min) spelling
    # realized and the strictly-less fold must preserve.
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    # duplicate entries per subspace: indexes 0 and 1 are equidistant
    cb = [
        [[1.0, 2.0], [1.0, 2.0], [9.0, 9.0]],
        [[5.0, 5.0], [1.0, 2.0], [1.0, 2.0]],
    ]
    row = pq_encode(df, cb).collect()[0]
    assert list(row.codes) == [0, 1]  # first minimum in each subspace
    assert row.recon_err == 0.0
