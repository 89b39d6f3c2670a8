"""Generate a 10x-scale (sf1) copy of the driver's synthetic testdata.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md) and the bench runs at
sf0.1 (~600 k lineitem rows).  Every 100 TB claim in PLANS.md is argued
from plan shape; this script provides the order-of-magnitude stress data
VERDICT r3 item 1 asks for: same schemas, same value domains, same
distributions (profiled from /root/testdata/sf0.1 — see the inline notes),
10x the rows.  Output goes inside the repo (testdata_sf1/, gitignored)
because /root/testdata is read-only.

Distribution notes (measured on the driver's sf0.1 parquet):
  - lines/order ~ Poisson(4), orders with 0 lines simply absent from
    lineitem (2,764 of 150 k observed vs 2,747 predicted).
  - l_shipdate is INDEPENDENT of o_orderdate (diff spans +/-2400 days,
    i.e. the full date-range cross product) — uniform over
    [1995-01-02, 2001-11-04]; o_orderdate uniform [1995-01-01, 2001-08-01].
  - l_extendedprice uniform [900, 105000], quantity integer 1..50,
    discount {0.00..0.10}, tax {0.00..0.08}, returnflag/linestatus uniform.
  - events: ts uniform over 30 days of 2024-01, five event types uniform,
    users = 15000*sf, value ~ Exponential(mean 50) rounded, props =
    {"k": randint(0,100)}.
  - documents: 31-word vocabulary, 10..100 words/doc uniform, lang
    {en:.43, zh/es/fr/de:~.14}, 20 uniform sources, ~0.2% exact-duplicate
    texts (the dedup queries need real duplicates).
  - embeddings: 64-dim isotropic gaussian normalized to unit length;
    labels uniform 0..9 (measured: NO cluster structure — centroid norms
    ~0.07).

Usage:  python scripts/gen_sf1.py [--sf 1.0] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def _ts_col(days_since_epoch):
    return pa.array(
        (days_since_epoch.astype("int64") * DAY_US), type=pa.timestamp("us")
    ).cast(pa.timestamp("us"))


def _dates(rng, n, lo, hi):
    """Uniform midnight timestamps in [lo, hi] (inclusive), ISO date strings."""
    lo_d = np.datetime64(lo).astype("datetime64[D]").astype(int)
    hi_d = np.datetime64(hi).astype("datetime64[D]").astype(int)
    return rng.integers(lo_d, hi_d + 1, n)


def _write(out, name, table):
    path = os.path.join(out, f"{name}.parquet")
    # MULTIPLE ROW GROUPS (>= 32 for any non-tiny table): a single-group
    # file collapses Spark's scan to ONE task no matter how many byte
    # splits it plans, so any filter the optimizer pushes below the
    # fan_out exchange runs single-threaded — measured at sf10 as a 93 s
    # straggler on embeddings.  Real lakes ship many files/groups; the
    # stress data should too.
    rows_per_group = max(1024, table.num_rows // 32)
    pq.write_table(table, path, compression="snappy",
                   row_group_size=rows_per_group)
    print(f"  {name}: {table.num_rows:,} rows -> {path}")


def gen(sf: float, out: str, seed: int = 421, tables: set[str] | None = None,
        vocab: str = "uniform31") -> None:
    """Generate the synthetic tables at ``sf``.  ``tables`` restricts the
    output set (e.g. {"documents","embeddings","events"} for the sf10
    stress run, where only the superlinear-risk families need data and
    the TPC-H tables would dominate the generation time).

    ``vocab`` selects the documents word distribution:
    - ``uniform31`` (default) — the historical 31-word uniform corpus.
      ADVERSARIAL for fingerprint operators: every shingle space
      saturates, so the dedup/text scale decades measure the saturation
      GUARDS rather than the operators (r8 verdict item 2).
    - ``zipf:<V>`` — V-word vocabulary sampled with a Zipf(s=1.1) rank
      distribution, the realistic web-text shape: fingerprint spaces
      stay sparse, so the decades measure the operators themselves.
      Both corpora are kept: realistic for the scale evidence, the
      saturated one as the guard stress case."""
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    def want(name: str) -> bool:
        return tables is None or name in tables

    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    # --- region / nation (fixed small dims, driver value domains) ---
    if want("region") or want("nation"):
        _write(out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int64()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }))
        _write(out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int64()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
        }))

    # --- customer / supplier / part ---
    if want("customer") or want("supplier") or want("part"):
        _write(out, "customer", pa.table({
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(
                np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])[
                    rng.integers(0, 5, n_cust)
                ]
            ),
        }))
        _write(out, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int64()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }))
        adjectives = ["large", "hot", "blue", "cold", "new", "old", "red", "small"]
        nouns = ["ring", "bolt", "anvil", "gear", "gizmo", "plate", "rod", "widget"]
        _write(out, "part", pa.table({
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": [
                f"{adjectives[a]} {nouns[b]}"
                for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
            ],
            "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
            "p_type": pa.array(
                np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])[
                    rng.integers(0, 6, n_part)
                ]
            ),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
        }))

    # --- orders ---
    if want("orders") or want("lineitem"):
        o_orderdate = _dates(rng, n_orders, "1995-01-01", "2001-08-01")
        _write(out, "orders", pa.table({
            "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
            "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_orders)]),
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
            "o_orderdate": _ts_col(o_orderdate),
            "o_orderpriority": pa.array(
                np.array(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                )[rng.integers(0, 5, n_orders)]
            ),
        }))

    # --- lineitem: Poisson(4) lines per order, zero-line orders absent ---
    if want("lineitem"):
        lines_per = rng.poisson(4.0, n_orders)
        l_orderkey = np.repeat(np.arange(n_orders), lines_per)
        n_li = len(l_orderkey)
        linenumber = (
            np.arange(n_li) - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1
        )
        _write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(l_orderkey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(linenumber, pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
            "l_shipdate": _ts_col(_dates(rng, n_li, "1995-01-02", "2001-11-04")),
        }))

    # --- events ---
    if want("events"):
        t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
        span = 30 * DAY_US
        ts = np.sort(t0 + rng.integers(0, span, n_events))
        ks = rng.integers(0, 100, n_events)
        _write(out, "events", pa.table({
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
            "event_type": pa.array(
                np.array(["click", "view", "purchase", "signup", "error"])[
                    rng.integers(0, 5, n_events)
                ]
            ),
            "value": np.round(np.minimum(rng.exponential(50.0, n_events), 560.0), 2),
            "props": [f'{{"k": {k}}}' for k in ks],
        }))

    # --- documents ---
    if want("documents"):
        if vocab.startswith("zipf:"):
            nv = int(vocab.split(":", 1)[1])
            # rank-frequency p(r) ∝ 1/r^1.1 (classic web-text exponent);
            # surface forms w0..w{V-1} — distinctness is what the
            # fingerprint spaces care about, not orthography
            ranks = np.arange(1, nv + 1, dtype="float64")
            zp = 1.0 / ranks ** 1.1
            zp /= zp.sum()
            words = np.array([f"w{i}" for i in range(nv)])
            n_words = rng.integers(10, 101, n_docs)
            draws = words[rng.choice(nv, size=int(n_words.sum()), p=zp)]
            offs = np.concatenate(([0], np.cumsum(n_words)))
            texts = [
                " ".join(draws[offs[i]:offs[i + 1]]) for i in range(n_docs)
            ]
        else:
            words = np.array(
                "a agg batch big column customer data dup fast filter group hash join "
                "key line merge order part query row scan slow small sort spark stream "
                "table the value vector window".split()
            )
            n_words = rng.integers(10, 101, n_docs)
            texts = [
                " ".join(words[rng.integers(0, len(words), k)])
                for k in n_words
            ]
        langs = np.array(["en", "zh", "es", "fr", "de"])
        lang_p = np.array([0.44, 0.15, 0.14, 0.135, 0.135])
        # exact duplicates (~0.2%) so dedup operators have real work
        for i in rng.choice(np.arange(1, n_docs), max(1, n_docs // 500), replace=False):
            texts[i] = texts[rng.integers(0, i)]
        _write(out, "documents", pa.table({
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": texts,
            "lang": pa.array(langs[rng.choice(5, n_docs, p=lang_p)]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    # --- embeddings: isotropic unit vectors (measured: no cluster structure) ---
    if want("embeddings"):
        vec = rng.normal(0, 1, (n_vecs, 64)).astype("float32")
        vec /= np.linalg.norm(vec, axis=1, keepdims=True)
        _write(out, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(list(vec), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
        }))

    with open(os.path.join(out, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "vocab": vocab,
                   "generator": "scripts/gen_sf1.py"}, f)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"))
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--vocab", default="uniform31",
                    help="documents vocabulary: uniform31 (historical, "
                    "fingerprint-saturating) or zipf:<V> (realistic "
                    "Zipf-distributed V-word vocabulary)")
    args = ap.parse_args()
    gen(args.sf, args.out,
        tables=set(args.tables.split(",")) if args.tables else None,
        vocab=args.vocab)
