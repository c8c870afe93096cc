"""Deterministic synthetic testdata generator — the CI stand-in for the
driver-generated tables (TESTDATA.md): same schemas, value domains, and
row-count scaling, seed-stable across runs.

The correctness gate (tools/check_oracle.py) is cross-engine on
whatever data is present, and the pytest suite computes expectations
from the data it reads, so CI does not need byte-identical tables —
only schema-compatible ones with the same structure: duplicate and
near-duplicate document groups, per-language marker vocabulary,
label-clustered embeddings, TPC-H-ish key relationships (including a
small fraction of dangling lineitem FKs, which the RI queries count),
and nanosecond event timestamps (the real tables are ns-encoded; the
loader's nanosAsLong path must be exercised in CI too).

Usage: python tools/gen_testdata.py SF OUT_DIR [SEED]
e.g.   python tools/gen_testdata.py 0.001 ci-testdata/sf0.001
A non-default SEED gives the cross-engine gate a fresh die-roll on
data-dependent rounding/boundary cases (the r7 ztest lesson).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
PTYPES = ["ECONOMY", "STANDARD", "PROMO", "SMALL", "LARGE"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]

# Word pools with the language-marker vocabulary the lang-ID heuristic
# keys on, plus a shared technical vocabulary so shingle overlap (and
# therefore near-dup structure) actually occurs.
TECH = (
    "spark query data table scan join merge sort hash filter group row "
    "batch value line order key part window small fast slow customer"
).split()
LANG_FILLER = {
    "en": "the and of to in is with for on that".split(),
    "de": "der die das und ist nicht mit ein von zu".split(),
    "es": "el la los las es una para con del por".split(),
    "fr": "le la les et est une pour dans avec sur".split(),
    "zh": list("数据查询表格排序合并分组窗口批次键值"),
}


def _doc_text(rng: np.random.Generator, lang: str, n_words: int) -> str:
    filler = LANG_FILLER[lang]
    words = []
    for _ in range(n_words):
        pool = TECH if rng.random() < 0.6 else filler
        words.append(pool[int(rng.integers(0, len(pool)))])
    return " ".join(words)


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    n_cust = max(30, int(150_000 * sf))
    n_supp = max(5, int(10_000 * sf))
    n_part = max(40, int(200_000 * sf))
    n_ord = max(300, int(1_500_000 * sf))
    n_li = max(1200, int(6_000_000 * sf))
    n_ev = max(200, int(1_000_000 * sf))
    n_doc = max(100, int(500_000 * sf))
    n_emb = max(100, int(500_000 * sf))

    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": NATIONS,
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int32()
                ),
            }
        ),
    )
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": [
                    SEGMENTS[i] for i in rng.integers(0, 5, n_cust)
                ],
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
    )
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
                "p_name": [f"part {i} green steel" for i in range(1, n_part + 1)],
                "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
                "p_type": [PTYPES[i] for i in rng.integers(0, 5, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
            }
        ),
    )

    day_us = 86_400_000_000
    o_epoch0_us = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate = o_epoch0_us + rng.integers(0, 2400, n_ord) * day_us
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(1, n_cust + 1, n_ord), pa.int64()
                ),
                "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_ord)],
                "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
                "o_orderdate": pa.array(odate, pa.timestamp("us")).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.integers(0, 5, n_ord)
                ],
            }
        ),
    )

    # ~0.5% dangling order keys so the RI/anti-join queries count >0
    lkey = rng.integers(1, n_ord + 1, n_li)
    dangle = rng.random(n_li) < 0.005
    lkey = np.where(dangle, lkey + n_ord, lkey)
    lship = o_epoch0_us + rng.integers(1, 2500, n_li) * day_us
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lkey, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(1, n_part + 1, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(1, n_supp + 1, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), pa.int32()
                ),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": [
                    ["N", "A", "R"][i]
                    for i in rng.integers(0, 3, n_li)
                ],
                "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
                "l_shipdate": pa.array(lship, pa.timestamp("us")),
            }
        ),
    )

    # events: ns-encoded timestamps across Jan 2024 (the loader's
    # nanosAsLong conversion path must be exercised in CI too)
    day_ns = 86_400_000_000_000
    e_epoch0 = np.datetime64("2024-01-01", "ns").astype(np.int64)
    ets = e_epoch0 + rng.integers(0, 30 * day_ns, n_ev)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("ns")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(1, n_ev + 1), pa.int64()),
                "ts": pa.array(np.sort(ets), pa.timestamp("ns")),
                "user_id": pa.array(
                    rng.integers(1, max(2, n_ev // 10), n_ev), pa.int64()
                ),
                "event_type": [
                    EVENT_TYPES[i]
                    for i in rng.choice(5, n_ev, p=[0.4, 0.3, 0.1, 0.1, 0.1])
                ],
                "value": np.round(rng.exponential(40, n_ev) + 0.01, 2),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
            },
            schema=schema,
        ),
    )

    # documents: 20 sources, 5 langs; ~8% exact dups, ~6% near-dups
    # (tail words swapped) so dedup/minhash/funnel queries have work
    langs = ["en"] * 4 + ["de", "es", "fr", "zh"]
    doc_texts: list[str] = []
    doc_lang: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.08:
            j = int(rng.integers(max(0, i - 50), i))
            doc_texts.append(doc_texts[j])  # exact dup
            doc_lang.append(doc_lang[j])
        elif i > 10 and r < 0.14:
            j = int(rng.integers(max(0, i - 50), i))
            w = doc_texts[j].split()
            k = max(1, len(w) // 10)
            for _ in range(k):
                w[int(rng.integers(0, len(w)))] = TECH[
                    int(rng.integers(0, len(TECH)))
                ]
            doc_texts.append(" ".join(w))  # near dup
            doc_lang.append(doc_lang[j])
        else:
            lang = langs[int(rng.integers(0, len(langs)))]
            doc_texts.append(
                _doc_text(rng, lang, int(rng.integers(25, 120)))
            )
            doc_lang.append(lang)
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": doc_texts,
                "lang": doc_lang,
                "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
                "n_chars": pa.array(
                    [len(t) for t in doc_texts], pa.int64()
                ),
            }
        ),
    )

    # embeddings: 64-dim float32, label-clustered around 10 centroids
    dim, n_lab = 64, 10
    cents = rng.normal(0, 1, (n_lab, dim))
    labels = rng.integers(0, n_lab, n_emb)
    vecs = (cents[labels] + rng.normal(0, 0.35, (n_emb, dim))).astype(
        np.float32
    )
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    out = sys.argv[2] if len(sys.argv) > 2 else f"ci-testdata/sf{sf}"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    generate(sf, out, seed)
    print(f"wrote sf={sf} tables to {out} (seed={seed})")
