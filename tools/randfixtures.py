"""Random fixture-shaped table generator — all 10 driver tables with
valid FKs, the pinned categorical domains, and deliberate hostile
edges the real fixtures never exercise:

- heavy VALUE TIES (price/quantity grids, duplicated event timestamps)
  → every rank/top-k tie-break path actually fires
- EMPTY GROUPS (nations 7-9 get no customers, custkeys 50+ no orders)
  → left-join + zero-count aggregate paths fire
- an all-single-token language, duplicate embeddings → the G13c
  NULL-aggregate and exact-cosine-tie paths fire

Used by tools/randsweep.py (full-registry off-fixture probe) and the
curated sweeps in tests/test_round11_random.py. The r11 sweep over
this generator found and fixed five real fixture-guarded defects:
window_lag_lead (.xx5 double-round split), join_asof_tolerance /
composed_q17 / text_entropy_quality (NULL-aggregate NaN-vs-None),
pipeline_neardup_eval_pr + ml_roc_auc (zero-denominator ANSI raise).
"""
import numpy as np, pandas as pd, pyarrow as pa, pyarrow.parquet as pq, os, json

WORDS = ["spark","join","order","fast","hash","table","scan","customer","query","filter","window","batch","merge","data","row","value","part","line","agg","key","slow","small","the","a"]

def us(series):
    return pd.to_datetime(series).astype("datetime64[us]")

def gen(seed: int, out: str):
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    def w(name, df):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(out, f"{name}.parquet"))
    region = pd.DataFrame({"r_regionkey": np.arange(5, dtype=np.int32),
                           "r_name": ["AFRICA","AMERICA","ASIA","EUROPE","MIDDLE EAST"]})
    w("region", region)
    n_nat = 10
    nation = pd.DataFrame({"n_nationkey": np.arange(n_nat, dtype=np.int32),
                           "n_name": [f"NATION_{i}" for i in range(n_nat)],
                           "n_regionkey": rng.randint(0, 5, n_nat).astype(np.int32)})
    w("nation", nation)
    n_cust = 60
    customer = pd.DataFrame({
        "c_custkey": np.arange(1, n_cust+1),
        "c_name": [f"Customer#{i}" for i in range(1, n_cust+1)],
        # only nations 0-6 get customers -> empty groups for 7-9
        "c_nationkey": rng.randint(0, 7, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(["AUTOMOBILE","BUILDING","FURNITURE","HOUSEHOLD","MACHINERY"], n_cust)})
    w("customer", customer)
    n_sup = 20
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(1, n_sup+1),
        "s_name": [f"Supplier#{i}" for i in range(1, n_sup+1)],
        "s_nationkey": rng.randint(0, n_nat, n_sup).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_sup), 2)})
    w("supplier", supplier)
    n_part = 40
    part = pd.DataFrame({
        "p_partkey": np.arange(1, n_part+1),
        "p_name": [" ".join(rng.choice(WORDS, 3)) for _ in range(n_part)],
        "p_brand": [f"Brand#{int(b)}" for b in rng.randint(1, 20, n_part)],
        "p_type": rng.choice(["ECONOMY","LARGE","MEDIUM","PROMO","SMALL","STANDARD"], n_part),
        "p_size": rng.randint(1, 50, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.choice([901.0, 1200.5, 1500.25, 1800.75], n_part), 2)})  # ties
    w("part", part)
    n_ord = 150
    # some customers get no orders (custkeys 50+ excluded)
    odates = pd.Timestamp("1995-01-01") + pd.to_timedelta(rng.randint(0, 2400, n_ord), unit="D")
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_ord+1),
        "o_custkey": rng.randint(1, 50, n_ord),
        "o_orderstatus": rng.choice(["F","O","P"], n_ord),
        "o_totalprice": np.round(rng.choice([1000.0, 2500.5, 50000.25, 99999.75], n_ord) + rng.randint(0, 3, n_ord), 2),  # heavy ties
        "o_orderdate": us(odates),
        "o_orderpriority": rng.choice(["1-URGENT","2-HIGH","3-MEDIUM","4-NOT SPECIFIED","5-LOW"], n_ord)})
    w("orders", orders)
    n_li = 400
    lkey = rng.randint(1, n_ord+1, n_li)
    linenum = pd.Series(lkey).groupby(lkey).cumcount().values + 1
    sdates = pd.Timestamp("1995-01-05") + pd.to_timedelta(rng.randint(0, 2400, n_li), unit="D")
    lineitem = pd.DataFrame({
        "l_orderkey": lkey,
        "l_partkey": rng.randint(1, n_part+1, n_li),
        "l_suppkey": rng.randint(1, n_sup+1, n_li),
        "l_linenumber": linenum.astype(np.int32),
        "l_quantity": rng.choice([1.0, 5.0, 10.0, 25.0, 50.0], n_li),  # tie grid
        "l_extendedprice": np.round(rng.choice([100.0, 2000.5, 30000.25], n_li) + rng.randint(0, 5, n_li), 2),
        "l_discount": rng.choice([0.0, 0.05, 0.1], n_li),
        "l_tax": rng.choice([0.0, 0.04, 0.08], n_li),
        "l_returnflag": rng.choice(["A","N","R"], n_li),
        "l_linestatus": rng.choice(["F","O"], n_li),
        "l_shipdate": us(sdates)})
    w("lineitem", lineitem)
    n_ev = 300
    base = pd.Timestamp("2024-01-01")
    ts = base + pd.to_timedelta(rng.randint(0, 30*24*3600, n_ev), unit="s")
    ts = pd.Series(ts)
    ts.iloc[::17] = ts.iloc[1::17].values[:len(ts.iloc[::17])]  # duplicate ts ties
    events = pd.DataFrame({
        "event_id": np.arange(1, n_ev+1),
        "ts": us(ts),
        "user_id": rng.randint(1, 25, n_ev),
        "event_type": rng.choice(["click","error","purchase","signup","view"], n_ev),
        "value": np.round(rng.uniform(0, 100, n_ev), 3),
        "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)]})
    w("events", events)
    # documents + embeddings (the generators proven in test_round11_random)
    langs = ["en","de","fr","xx"]
    rows = []
    for i in range(120):
        lang = langs[int(rng.randint(len(langs)))]
        text = WORDS[int(rng.randint(len(WORDS)))] if lang == "xx" else " ".join(WORDS[int(rng.randint(len(WORDS)))] for _ in range(int(rng.randint(1, 40))))
        rows.append({"doc_id": i, "text": text, "lang": lang, "source": f"src{int(rng.randint(3))}", "n_chars": len(text)})
    w("documents", pd.DataFrame(rows))
    nvec = 400
    vecs = rng.normal(size=(nvec, 64)).astype(np.float32)
    for i in range(0, nvec, 5):
        vecs[i] = vecs[int(rng.randint(nvec))]
    w("embeddings", pd.DataFrame({"vec_id": range(nvec), "embedding": [v.tolist() for v in vecs], "label": [int(x) for x in rng.randint(0, 4, nvec)]}))

if __name__ == "__main__":
    import sys
    gen(int(sys.argv[1]), sys.argv[2])
