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


# ----------------------- randomized media payloads (VERDICT r11 #6)
# The registered multimodal ops synthesize filter-0 grayscale PNGs and
# 8 kHz mono WAVs from document text, so the decoder's other arms
# (PNG filters 1-4, RGB/RGBA channels, other sample rates) never see a
# fixture byte. These generators produce spec-valid payloads that DO
# exercise those arms, together with the exact expected feature dict,
# for the multi-seed round-trip tests in tests/test_multimodal.py.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def rand_png_payload(rng) -> tuple[bytes, dict]:
    """Random spec-valid 8-bit PNG: random dims, random color type
    (grayscale / RGB / RGBA), and a RANDOM FILTER TYPE PER SCANLINE
    with at least one type-2 (Up) row forced when height > 1. Returns
    (payload, expected decode_png feature dict)."""
    import struct
    import zlib

    width = int(rng.randint(1, 24))
    height = int(rng.randint(1, 24))
    color_type = int([0, 2, 6][rng.randint(3)])
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * channels
    pixels = rng.randint(0, 256, size=(height, stride)).astype(np.uint8)
    fts = [int(rng.randint(5)) for _ in range(height)]
    if height > 1 and 2 not in fts:
        fts[int(rng.randint(1, height))] = 2
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = pixels[y].astype(np.int32)
        ft = fts[y]
        filt = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = int(line[i - channels]) if i >= channels else 0
            b = int(prev[i])
            c = int(prev[i - channels]) if i >= channels else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (int(line[i]) - pred) & 0xFF
        raw += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    total = int(pixels.astype(np.int64).sum())
    expected = {
        "width": width,
        "height": height,
        "duration_ms": 0,
        "mean_milli": (total * 1000) // (height * stride),
    }
    return payload, expected


def rand_wav_payload(rng) -> tuple[bytes, dict]:
    """Random 16-bit mono PCM WAV: random length and sample rate.
    Returns (payload, expected decode_wav feature dict)."""
    import io
    import struct
    import wave

    n = int(rng.randint(1, 600))
    rate = int([8000, 16000, 22050, 44100][rng.randint(4)])
    samples = rng.randint(-32768, 32768, size=n).astype(np.int64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n}h", *[int(s) for s in samples]))
    expected = {
        "width": n,
        "height": 1,
        "duration_ms": (n * 1000) // rate,
        "mean_milli": int(np.abs(samples).sum() * 1000) // n,
    }
    return buf.getvalue(), expected
