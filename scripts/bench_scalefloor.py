"""Scale sweep: is the >2x sub-second tail a CONSTANT stage floor?

scripts/bench_rowgroups_r9.json settled one half of the question: on a
splittable 64k-row-group layout Spark's wall halves (one task no longer
feeds 32 cores) — but DuckDB speeds up just as much, so the RATIO at
sf0.1 does not collapse. The remaining hypothesis is that Spark's
per-query cost is `floor + marginal x rows` with a large floor (~0.2 s:
job scheduling, task launch, columnar->row, collect) and a competitive
marginal cost, while DuckDB's floor is ~10 ms. If that is true, the
ratio must collapse as the data grows at FIXED query shape; if it is
false (Spark's marginal per-row cost is also 10x), the ratio stays flat
and the bench tail is a real engine deficit.

Method: duplicate the two fact tables (lineitem, orders) k in {1,3,10}
times with the order keys offset by copy_index * 2^32 — per-order
basket sizes, join fan-outs, and exists/not-exists cardinalities stay
exactly realistic (a plain row duplication would inflate j18's
within-order pair expansion quadratically). Dimensions stay single-copy,
as they do at real scale. Both layouts use 64k row groups. Re-time the
five scan-floor headliners under the bench.py fulleval protocol on both
engines and emit scripts/bench_scalefloor_r9.json.

Run: python scripts/bench_scalefloor.py   (~5 min; writes the artifact)

Round-10 extension (judge task #1): SPARK_GRAFT_SCALEFLOOR_FULL=1 runs
ALL bench.py headline queries instead of the 5 scan-floor headliners, at
scales {1,10} by default, and scales EVERY fact-like table, not just the
two relational facts:

  - lineitem / orders: key-offset duplication (unchanged — per-order
    basket sizes and join fan-outs stay exactly realistic)
  - events: event_id AND user_id offset per copy (per-user session /
    funnel / retention cardinalities stay realistic)
  - documents: doc_id offset; copies get a seeded word-level shuffle of
    the text, so exact/near-dup cardinalities stay realistic (a plain
    text duplication would hand the dedup tier k-sized clusters
    everywhere and blow pair outputs up quadratically on BOTH engines —
    that measures duplicate-mass handling, not scan scale)
  - embeddings: vec_id offset; copies get seeded random directions at
    the source row's norm (plain vector duplication makes every vector
    a 0.999-cosine twin of k-1 others — same quadratic distortion)
  - dimensions (region nation customer supplier part): single-copy

Writes scripts/bench_scalefloor_full_r10.json with per-query ratios at
each scale and a falls/flat verdict per query.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

FULL = os.environ.get("SPARK_GRAFT_SCALEFLOOR_FULL") == "1"
# Round-11 extension: SPARK_GRAFT_SCALEFLOOR_QUERIES="q1,...,qn" sweeps an
# arbitrary headline subset (e.g. the flat-ratio tail at a deeper scale
# point) with the SAME realistic per-table scaling as full mode.
QUERY_OVERRIDE = [
    q for q in os.environ.get("SPARK_GRAFT_SCALEFLOOR_QUERIES", "").split(",")
    if q
]
if QUERY_OVERRIDE:
    QUERIES = QUERY_OVERRIDE
elif FULL:
    from bench import HEADLINE as QUERIES
else:
    QUERIES = [
        "q1_pricing_summary",
        "j1_brand_revenue",
        "q21_waiting_supplier",
        "a36_corr_matrix",
        "j18_brand_affinity",
    ]
# realistic per-table scaling for every fact-like table (not just the two
# relational facts) applies in full mode and for explicit query subsets
SCALE_ALL_TABLES = FULL or bool(QUERY_OVERRIDE)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FACTS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
SCALES = [
    int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALES", "1,10" if FULL else "1,3,10,30"
    ).split(",")
]
ROW_GROUP_SIZE = 65_536
KEY_STRIDE = 1 << 32
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
# Per-query rep cap: when a single rep exceeds this, record that one
# sample instead of the median of REPS (and list the query under
# protocol.capped). Exists for the ORACLE side of scaled points — e.g.
# geo_nearest_join's DuckDB oracle is the naive all-pairs argmin join
# (the whole point of the Spark grid-bucketed plan), which goes
# superlinear with scale; 5 reps of a ~10-minute oracle would dominate
# the sweep without changing the verdict.
CAP_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_CAP_SEC", "90"))
CAPPED: list[str] = []
# Oracles that cannot run at scaled points on this box at all: the
# geo_nearest_join oracle's within-cell candidate expansion + window
# materialization OOMed DuckDB's 80%-RAM limit at 10x, then filled the
# disk with ~80 GB of spill before dying — while the Spark grid plan
# finished the same point in seconds. Skipped-and-recorded rather than
# crashed: the asymmetry IS the scale evidence.
DUCKDB_SKIP = set(
    q for q in os.environ.get("SPARK_GRAFT_DUCKDB_SKIP", "").split(",") if q
)


def _offset_col(table, col: str, off: int):
    """Cast ``col`` to int64 and add ``off`` (0 = cast only)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    v = pc.cast(table[col], pa.int64())
    if off:
        v = pc.add(v, pa.scalar(off))
    return table.set_column(
        table.schema.get_field_index(col), pa.field(col, pa.int64()), v
    )


def _scale_events(table, k: int):
    """k copies with event_id and user_id offset — per-user cardinality
    (sessions, funnels, cohorts) stays exactly realistic."""
    import pyarrow as pa

    copies = []
    for i in range(k):
        c = _offset_col(table, "event_id", i * KEY_STRIDE)
        c = _offset_col(c, "user_id", i * KEY_STRIDE)
        copies.append(c)
    return pa.concat_tables(copies)


def _scale_documents(table, k: int):
    """k copies with doc_id offset; copy i>0 texts are a seeded word
    shuffle so exact/near-dup cluster sizes stay realistic at scale."""
    import random

    import pyarrow as pa

    base = _offset_col(table, "doc_id", 0)
    texts = base["text"].to_pylist()
    copies = [base.set_column(
        base.schema.get_field_index("n_chars"),
        pa.field("n_chars", pa.int64()),
        pa.array([len(t) if t is not None else 0 for t in texts],
                 pa.int64()),
    )]
    # copy 0 keeps original text; recompute n_chars uniformly so every
    # copy's n_chars matches its text under the same definition
    for i in range(1, k):
        shuffled = []
        for j, t in enumerate(texts):
            if t is None:
                shuffled.append(None)
                continue
            words = t.split()
            random.Random((i << 32) | j).shuffle(words)
            shuffled.append(" ".join(words))
        c = _offset_col(base, "doc_id", i * KEY_STRIDE)
        c = c.set_column(
            c.schema.get_field_index("text"),
            pa.field("text", pa.string()), pa.array(shuffled, pa.string()),
        )
        c = c.set_column(
            c.schema.get_field_index("n_chars"),
            pa.field("n_chars", pa.int64()),
            pa.array([len(t) if t is not None else 0 for t in shuffled],
                     pa.int64()),
        )
        copies.append(c)
    return pa.concat_tables(copies)


def _scale_embeddings(table, k: int):
    """k copies with vec_id offset; copy i>0 vectors are seeded random
    directions at the source row's norm (duplicated vectors would be
    0.999-cosine twins and quadratically distort the near-dup tier)."""
    import math
    import random

    import pyarrow as pa

    base = _offset_col(table, "vec_id", 0)
    vecs = base["embedding"].to_pylist()
    copies = [base]
    for i in range(1, k):
        new_vecs = []
        for j, v in enumerate(vecs):
            if v is None:
                new_vecs.append(None)
                continue
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            rng = random.Random((i << 32) | j)
            d = [rng.gauss(0.0, 1.0) for _ in v]
            dn = math.sqrt(sum(x * x for x in d)) or 1.0
            new_vecs.append([x / dn * norm for x in d])
        c = _offset_col(base, "vec_id", i * KEY_STRIDE)
        c = c.set_column(
            c.schema.get_field_index("embedding"),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.array(new_vecs, pa.list_(pa.float32())),
        )
        copies.append(c)
    return pa.concat_tables(copies)


def build_scaled(src_dir: str, dst_dir: str, k: int) -> dict[str, int]:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    rows = {}
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        table = pq.ParquetFile(src).read()
        if SCALE_ALL_TABLES and k > 1 and t == "events":
            table = _scale_events(table, k)
        elif SCALE_ALL_TABLES and k > 1 and t == "documents":
            table = _scale_documents(table, k)
        elif SCALE_ALL_TABLES and k > 1 and t == "embeddings":
            table = _scale_embeddings(table, k)
        elif t in FACTS and k > 1:
            key = FACTS[t]
            copies = []
            for i in range(k):
                if i == 0:
                    copies.append(table)
                    continue
                off = pc.add(
                    pc.cast(table[key], pa.int64()), pa.scalar(i * KEY_STRIDE)
                )
                copies.append(table.set_column(
                    table.schema.get_field_index(key),
                    pa.field(key, pa.int64()), off,
                ))
            # align the key dtype of copy 0 with the offset copies
            copies[0] = copies[0].set_column(
                copies[0].schema.get_field_index(key),
                pa.field(key, pa.int64()),
                pc.cast(copies[0][key], pa.int64()),
            )
            table = pa.concat_tables(copies)
        pq.write_table(table, dst, row_group_size=ROW_GROUP_SIZE,
                       compression="zstd")
        rows[t] = table.num_rows
    return rows


def ratio_for(spark_sec: float, duck_sec: float | None) -> float | None:
    """Spark/DuckDB ratio; None ONLY for a skipped/failed oracle (None).

    A 0.0 DuckDB median is a measured sub-millisecond value, not a skip —
    conflating it with None (the old truthiness check) misclassified the
    query as 'oracle_infeasible_at_scale'. It maps to +inf: JSON-encodes
    as Infinity and compares correctly in the falls/flat verdict."""
    if duck_sec is None:
        return None
    if duck_sec == 0.0:
        return float("inf")
    return round(spark_sec / duck_sec, 2)


def jsonsafe(obj):
    """Strict-JSON copy: float('inf') ratios become the string "inf".

    ADVICE round 12: json.dumps serializes float('inf') as bare
    Infinity, which jq/JS/strict parsers reject — the in-memory value
    stays a float (verdict comparisons rely on inf ordering); only the
    serialized form is marked."""
    if isinstance(obj, float) and obj == float("inf"):
        return "inf"
    if isinstance(obj, dict):
        return {k: jsonsafe(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [jsonsafe(v) for v in obj]
    return obj


def time_spark(spark, qs, name: str, sf_dir: str) -> float:
    from bench import _run

    samples = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        _run(df, "fulleval")
        samples.append(time.perf_counter() - t0)
        if samples[-1] > CAP_SEC:
            CAPPED.append(f"spark:{name}")
            break
    return round(statistics.median(samples), 3)


def time_duckdb(sf_dir: str, oracles) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    for name in QUERIES:
        if name in DUCKDB_SKIP:
            CAPPED.append(f"duckdb-skipped:{name}")
            out[name] = None
            continue
        samples = []
        try:
            for _ in range(REPS):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                samples.append(time.perf_counter() - t0)
                if samples[-1] > CAP_SEC:
                    CAPPED.append(f"duckdb:{name}")
                    break
        except Exception as exc:  # OOM / spill-disk-full: record, go on
            CAPPED.append(f"duckdb-failed:{name}:{type(exc).__name__}")
            out[name] = None
            continue
        out[name] = round(statistics.median(samples), 3)
        print(json.dumps({"duckdb_done": name, "sec": out[name]}),
              flush=True)
    con.close()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from datagouvfr_data_pipelines_spark import plans
    from datagouvfr_data_pipelines_spark.session import get_spark

    input_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).rglob("*") if f.is_file()
    )
    qs = plans.queries()
    oracles = plans.oracle_sql()

    points = []
    for k in SCALES:
        # fresh session per scale point, sized for THAT point's input —
        # the same shuffle-partition tuning bench.py applies at its own
        # scale, so the 1x point is not penalized by a 30x-sized config
        spark = get_spark(
            app_name=f"bench_scalefloor_x{k}",
            master=f"local[{cpus}]",
            input_bytes=input_bytes * k,
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        scaled = tempfile.mkdtemp(prefix=f"sfx{k}_")
        try:
            rows = build_scaled(sf_dir, scaled, k)
            spark_t = {n: time_spark(spark, qs, n, scaled) for n in QUERIES}
            # flush Spark timings immediately: the oracle phase can die
            # (the 10x geo oracle OOMed DuckDB then filled the disk) and
            # 40 minutes of Spark measurements must survive that
            print(json.dumps({"spark_phase_done": k, "spark_sec": spark_t}),
                  flush=True)
            duck_t = time_duckdb(scaled, oracles)
            points.append({
                "scale_x": k,
                "lineitem_rows": rows["lineitem"],
                "spark_sec": spark_t,
                "duckdb_sec": duck_t,
                "ratio": {
                    n: ratio_for(spark_t[n], duck_t[n]) for n in QUERIES
                },
            })
            print(json.dumps(jsonsafe(points[-1])))
        finally:
            shutil.rmtree(scaled, ignore_errors=True)
            spark.stop()

    result = {
        "protocol": {
            "action": "fulleval", "reps": REPS, "stat": "median",
            "cpus": int(cpus), "row_group_size": ROW_GROUP_SIZE,
            "base_sf_dir": sf_dir, "fact_key_stride": KEY_STRIDE,
            "full_headline_set": FULL, "n_queries": len(QUERIES),
            "rep_cap_sec": CAP_SEC, "capped": CAPPED,
            "load_avg": round(os.getloadavg()[0], 2),
        },
        "points": points,
    }
    if len(points) >= 2:
        # per-query verdict between the first and last scale point:
        # 'falls' = the Spark/DuckDB ratio shrank with scale (stage-floor
        # class, amortizes horizontally); 'flat_or_rises' queries are the
        # ones worth a plan audit.
        first, last = points[0]["ratio"], points[-1]["ratio"]
        result["verdict"] = {
            n: {
                "ratio_first": first[n],
                "ratio_last": last[n],
                "class": (
                    "oracle_infeasible_at_scale"
                    if last[n] is None or first[n] is None
                    else "falls" if last[n] < first[n] * 0.85
                    else "flat_or_rises"
                ),
            }
            for n in QUERIES
        }
    out = os.environ.get(
        "SPARK_GRAFT_SCALEFLOOR_OUT",
        os.path.join(
            REPO_ROOT, "scripts",
            "bench_scalefloor_full_r10.json" if FULL
            else "bench_scalefloor_r9.json",
        ),
    )
    with open(out, "w") as fh:
        json.dump(jsonsafe(result), fh, indent=1)
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
