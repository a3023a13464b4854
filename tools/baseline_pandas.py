#!/usr/bin/env python3
"""Dev-only baseline harness: times single-threaded pandas equivalents
of four headline graft queries, the way the reference (a pandas+sklearn
pipeline) would compute them. Produces the numeric denominator for
BASELINE.md — the reference repo publishes no throughput numbers of its
own.

NOT part of the library (driver-side python stack only).

Usage: python3 tools/baseline_pandas.py [sf_dir ...]
"""
import sys, time
import pandas as pd


def best_of(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def q1(d):
    li = pd.read_parquet(f"{d}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    li = li[li.l_shipdate <= pd.Timestamp("1998-09-02")]
    li = li.assign(disc_price=li.l_extendedprice * (1 - li.l_discount),
                   charge=li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax))
    return (li.groupby(["l_returnflag", "l_linestatus"])
            .agg(sum_qty=("l_quantity", "sum"), sum_base_price=("l_extendedprice", "sum"),
                 sum_disc_price=("disc_price", "sum"), sum_charge=("charge", "sum"),
                 avg_qty=("l_quantity", "mean"), avg_price=("l_extendedprice", "mean"),
                 avg_disc=("l_discount", "mean"), count_order=("l_quantity", "size"))
            .reset_index().sort_values(["l_returnflag", "l_linestatus"]))


def q2(d):
    li = pd.read_parquet(f"{d}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    o = pd.read_parquet(f"{d}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    o = o[(o.o_orderdate >= pd.Timestamp("1996-01-01")) &
          (o.o_orderdate < pd.Timestamp("1998-01-01"))]
    c = pd.read_parquet(f"{d}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{d}/nation.parquet")
    r = pd.read_parquet(f"{d}/region.parquet")
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey")
         .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    j = j.assign(rev=j.l_extendedprice * (1 - j.l_discount))
    return (j.groupby(["r_name", "n_name"])
            .agg(revenue=("rev", "sum"), n_items=("rev", "size"))
            .reset_index().sort_values(["r_name", "n_name"]))


def q_impute_median(d):
    li = pd.read_parquet(f"{d}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity", "l_returnflag"])
    q = li.l_quantity.where(li.l_quantity >= 5)
    f = li.l_returnflag.where(li.l_orderkey % 5 != 0)
    med, mean = q.median(), q.mean()
    mode = f.value_counts().sort_index().sort_values(ascending=False, kind="stable").index[0]
    return pd.DataFrame([{
        "n_rows": len(li), "n_null_q": int(q.isna().sum()),
        "sum_q_median": q.fillna(med).sum(), "sum_q_mean": q.fillna(mean).sum(),
        "sum_q_zero": q.fillna(0).sum(),
        "n_mode_value": int((f.fillna(mode) == mode).sum()),
        "median_used": med, "mean_used": mean, "mode_used": mode}])


def q_roc_auc(d):
    ev = pd.read_parquet(f"{d}/events.parquet", columns=["event_id", "value"])
    label = (ev.value >= 50).astype(int)
    score = ev.value.clip(upper=200.0) / 200.0 * 0.7 + (ev.event_id % 100) / 1000.0 * 3.0 / 10.0
    # mid-rank Mann-Whitney AUC == sklearn roc_auc_score
    r = score.rank(method="average")
    npos = int(label.sum()); nneg = len(label) - npos
    auc = (r[label == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    return pd.DataFrame([{"roc_auc": auc}])


def q_dedup_incremental(d):
    import hashlib
    docs = pd.read_parquet(f"{d}/documents.parquet", columns=["doc_id", "text"])
    sub = docs[docs.doc_id % 10 == 0]
    old = sub[sub.doc_id % 20 == 0]
    new = sub[sub.doc_id % 20 != 0]
    old_dg = set(old.text.map(lambda t: hashlib.md5(t.encode()).hexdigest()))
    new_dg = new.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    exact = set(new.doc_id[new_dg.isin(old_dg).values])
    # the single-process reference shape: per-doc shingle sets, then
    # new×old pairwise Jaccard (no distributed banded index to lean on).
    # 7-gram shingles — the r14 query semantics (the 3-gram space's
    # background J defeats any candidate pruning; see SCALING.md)
    def sh(t):
        return {t[i:i + 7] for i in range(len(t) - 6)}
    old_sh = [sh(t) for t in old.text]
    near = set()
    for i, t in zip(new.doc_id, new.text):
        si = sh(t)
        for sj in old_sh:
            inter = len(si & sj)
            if inter and inter / (len(si) + len(sj) - inter) >= 0.62:
                near.add(i)
                break
    return pd.DataFrame([{
        "n_new": len(new), "n_exact_dup": len(exact), "n_near_dup": len(near),
        "n_kept": len(new) - len(exact | near)}])


def q_gopher_rules(d):
    import re
    docs = pd.read_parquet(f"{d}/documents.parquet", columns=["source", "text"])
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    alpha_re = re.compile("[A-Za-z]")
    # the single-process reference shape: one python pass per document
    # (pandas has no vectorized tokenizer; .str methods still walk
    # python objects for list results)
    def per_doc(t):
        tk = t.strip().split()
        wc = len(tk)
        mwl = sum(len(x) for x in tk) / wc
        sym = (t.count("#") + t.count("...")) / wc
        alpha = sum(1 for x in tk if alpha_re.search(x)) / wc
        st = set(tk)
        stop_hits = sum(1 for w in stops if w in st)
        return (50 <= wc <= 100000, 3.0 <= mwl <= 10.0, sym <= 0.1,
                alpha >= 0.8, stop_hits >= 2)
    flags = pd.DataFrame([per_doc(t) for t in docs.text],
                         columns=["ok_wc", "ok_mwl", "ok_sym", "ok_alpha", "ok_stop"])
    flags["ok_all"] = (flags.ok_wc & flags.ok_mwl & flags.ok_sym
                       & flags.ok_alpha & flags.ok_stop)
    flags["source"] = docs.source.values
    g = flags.groupby("source")
    return pd.DataFrame({
        "n_docs": g.size(),
        "fail_wordcount": g.size() - g.ok_wc.sum(),
        "fail_meanwordlen": g.size() - g.ok_mwl.sum(),
        "fail_symbolratio": g.size() - g.ok_sym.sum(),
        "fail_alphawords": g.size() - g.ok_alpha.sum(),
        "fail_stopwords": g.size() - g.ok_stop.sum(),
        "n_pass": g.ok_all.sum(),
    }).reset_index().sort_values("source")


def q_scd2(d):
    o = pd.read_parquet(f"{d}/orders.parquet",
                        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"])
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    prev = o.groupby("o_custkey")["o_orderpriority"].shift()
    o["chg"] = (prev.isna() | (prev != o.o_orderpriority)).astype("int64")
    o["version"] = o.groupby("o_custkey")["chg"].cumsum()
    g = (o.groupby(["o_custkey", "version", "o_orderpriority"], sort=False)
           .agg(valid_from=("o_orderdate", "min"), n_orders=("o_orderkey", "size"))
           .reset_index())
    g = g.sort_values(["o_custkey", "version"])
    # epoch SECONDS with the same far-future sentinel as the Spark query
    # and the DuckDB oracle (253402300800 = 10000-01-01T00:00:00Z): a
    # pd.Timestamp("9999-12-31") sentinel is a different epoch value
    # (253402214400) AND a different dtype, so the value-check against
    # the oracle could never be string-identical for current rows.
    g["valid_from_s"] = g.valid_from.astype("datetime64[s]").astype("int64")
    nxt = g.groupby("o_custkey")["valid_from_s"].shift(-1)
    g["valid_to_s"] = nxt.fillna(253402300800).astype("int64")
    return g.drop(columns=["valid_from"])



def q_cluster_assign(d):
    # numpy twin of the similarity family's representative: assign every
    # embedding to its max-cosine centroid (centroids = 8 smallest
    # vec_id embeddings), cosines rounded HALF-AWAY-FROM-ZERO to 4 dp
    # BEFORE the argmax (both engines do), ties -> smaller centroid id.
    import numpy as np
    e = pd.read_parquet(f"{d}/embeddings.parquet", columns=["vec_id", "embedding"])
    e = e.sort_values("vec_id").reset_index(drop=True)
    X = np.vstack(e.embedding.to_numpy()).astype("float64")
    C = X[:8]  # rows are vec_id-sorted, so these are the 8 smallest ids
    cids = e.vec_id.to_numpy()[:8]
    sims = (X @ C.T) / (np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :])
    sims = np.sign(sims) * np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4
    best = sims.argmax(axis=1)  # first max = smallest cid (columns cid-ordered)
    return pd.DataFrame({"vec_id": e.vec_id,
                         "cluster_id": cids[best],
                         "cos": sims[np.arange(len(e)), best]})

QUERIES = {"q1_pricing_summary": q1, "q2_revenue_nation": q2,
           "q_scd2": q_scd2,
           "q_impute_median": q_impute_median, "q_roc_auc": q_roc_auc,
           "q_dedup_incremental": q_dedup_incremental,
           "q_gopher_rules": q_gopher_rules,
           "q_cluster_assign": q_cluster_assign}

if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for d in dirs:
        for name, fn in QUERIES.items():
            t = best_of(lambda: fn(d))
            print(f"{d} {name} {t:.3f}s")
