"""S13 file listing + F3 validation cache pattern."""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.functions.validation import validate_resources
from datagouvfr_data_pipelines_spark.io.listing import files_as_dataframe, list_files


def test_list_files_and_glob(spark, tmp_path):
    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "b.csv").write_text("xy")
    (tmp_path / "c.txt").write_text("z")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "d.csv").write_text("deep")

    flat = list_files(spark, str(tmp_path))
    names = {e.path.rsplit("/", 1)[-1] for e in flat}
    assert {"a.csv", "b.csv", "c.txt"} <= names and "d.csv" not in names

    rec = list_files(spark, str(tmp_path), recursive=True)
    assert "d.csv" in {e.path.rsplit("/", 1)[-1] for e in rec}

    globbed = list_files(spark, str(tmp_path), glob="*.csv")
    assert {e.path.rsplit("/", 1)[-1] for e in globbed} == {"a.csv", "b.csv"}
    sizes = {e.path.rsplit("/", 1)[-1]: e.size for e in globbed}
    assert sizes["b.csv"] == 2

    df = files_as_dataframe(spark, globbed)
    assert df.count() == 2 and set(df.columns) == {"path", "size", "modification_time"}


def test_validate_resources_cache_skip(spark):
    resources = spark.createDataFrame(
        [("r1", "2024-01-10"), ("r2", "2024-01-10"), ("r3", "2024-01-10")],
        "resource_id string, last_modified string",
    )
    # r1 has a report newer than its modification -> reused; r2's is stale
    cache = spark.createDataFrame(
        [("r1", True, 0, "2024-02-01"), ("r2", False, 3, "2023-12-01")],
        "resource_id string, is_valid boolean, n_errors int, validated_at string",
    )
    out = {r["resource_id"]: r for r in validate_resources(resources, cache).collect()}
    assert set(out) == {"r1", "r2", "r3"}
    assert out["r1"]["validated_at"] == "2024-02-01"   # cache hit kept
    assert out["r2"]["validated_at"] == "fake-run"     # stale -> re-validated
    assert out["r3"]["validated_at"] == "fake-run"     # never validated
    # no cache at all: everything validated
    out2 = validate_resources(resources, None)
    assert out2.count() == 3


def test_quarantine_split_null_fails_closed(spark):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.quality import quarantine_split

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -3.0, "b"), (3, None, "c"), (4, 5.0, None)],
        "id long, price double, name string",
    )
    passed, violations = quarantine_split(
        df,
        {
            "price_positive": F.col("price") > 0,
            "name_present": F.col("name").isNotNull(),
        },
    )
    assert sorted(r.id for r in passed.collect()) == [1]
    v = sorted((r.id, r.violated_rule) for r in violations.collect())
    # row 2: bad price; row 3: NULL price fails CLOSED; row 4: missing name
    assert v == [
        (2, "price_positive"),
        (3, "price_positive"),
        (4, "name_present"),
    ]
    # conservation: distinct violation ids + passed == input
    assert {r.id for r in passed.collect()} | {
        r.id for r in violations.collect()
    } == {1, 2, 3, 4}


def test_k_anonymity_audit(spark):
    from datagouvfr_data_pipelines_spark.quality import k_anonymity_audit

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)],
        "seg string, zone int",
    )
    risky = k_anonymity_audit(df, ["seg", "zone"], k=5).collect()
    got = sorted((r["seg"], r["zone"], r["group_size"]) for r in risky)
    assert got == [("a", 2, 2), ("b", 1, 1)]
    assert k_anonymity_audit(df, ["seg"], k=5).where("seg = 'a'").count() == 0


def test_luhn_valid_matches_reference_impl(spark):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.functions.validation import luhn_valid

    def luhn_py(s):
        if not s.isdigit() or not s:
            return False
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    cases = [str(130025265 + i) for i in range(200)] + [
        "356000000",   # classic valid SIREN (La Poste)
        "79250000",
        "",
        "12a456789",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["ok"] for r in df.select("s", luhn_valid("s").alias("ok")).collect()}
    for c in cases:
        assert got[c] == luhn_py(c), c
    assert got["356000000"] is True


def test_validate_resources_size_cap(spark):
    """Resources above the 1e8-byte cap never reach the validator
    (reference refuses to download them into Validata); they return
    NULL is_valid with a named skip marker."""
    from datagouvfr_data_pipelines_spark.functions.validation import (
        validate_resources,
    )

    res = spark.createDataFrame(
        [("r1", "2024-01-01", 1000), ("r2", "2024-01-01", 200_000_000)],
        "resource_id string, last_modified string, n_bytes long",
    )
    out = {
        r["resource_id"]: r
        for r in validate_resources(
            res, None, size_col="n_bytes"
        ).collect()
    }
    assert out["r1"]["validated_at"] == "fake-run"
    assert out["r2"]["validated_at"] == "skipped:size"
    assert out["r2"]["is_valid"] is None


# ---------------------------------------------------------------------------
# drop_versions_sample: behavioral parity with the reference sampler
# (schema/utils/consolidation.py:96-125) — bounds Validata work per schema
# ---------------------------------------------------------------------------


def test_drop_versions_sample_more_majors_than_keep():
    from datagouvfr_data_pipelines_spark.functions.validation import (
        drop_versions_sample,
    )

    versions = ["1.0", "1.1", "2.0", "2.1", "3.0", "4.0", "5.2", "5.1", "6.0", "7.3"]
    # 7 majors >= 5: keep the latest of each of the 5 most recent majors
    # (3.0, 4.0, 5.2, 6.0, 7.3); drop the rest, input order preserved
    assert drop_versions_sample(versions) == ["1.0", "1.1", "2.0", "2.1", "5.1"]


def test_drop_versions_sample_fill_from_latest():
    from datagouvfr_data_pipelines_spark.functions.validation import (
        drop_versions_sample,
    )

    versions = ["1.0", "1.1", "1.2", "2.0", "2.1", "2.2"]
    # 2 majors: keep 1.2 and 2.2, then top up with the most recent
    # remaining (2.1, 2.0, 1.1) to reach 5 -> only 1.0 is dropped
    assert drop_versions_sample(versions) == ["1.0"]


def test_drop_versions_sample_single_major_promotes_minors():
    from datagouvfr_data_pipelines_spark.functions.validation import (
        drop_versions_sample,
    )

    versions = ["1.0.0", "1.1.0", "1.1.5", "1.2.0", "1.3.0", "1.4.0", "1.5.0"]
    # one major -> minors act as majors: 6 minor lineages, keep the latest
    # of the 5 most recent (1.1.5, 1.2.0, 1.3.0, 1.4.0, 1.5.0)
    assert drop_versions_sample(versions) == ["1.0.0", "1.1.0"]


def test_drop_versions_sample_level2_and_small_histories():
    from datagouvfr_data_pipelines_spark.functions.validation import (
        drop_versions_sample,
    )

    # single full lineage bottoms out at level 2: nothing dropped
    assert drop_versions_sample(["1.0.0"]) == []
    assert drop_versions_sample(["1.0.0", "1.0.0"]) == []
    # three patch versions of one minor: promoted twice, 3 "majors" < 5,
    # fill keeps all three
    assert drop_versions_sample(["1.0.0", "1.0.1", "1.0.2"]) == []


def test_drop_versions_sample_non_numeric_sorts_last():
    from datagouvfr_data_pipelines_spark.functions.validation import (
        comparer_versions,
        drop_versions_sample,
    )

    assert comparer_versions("1.2.3") == [1, 2, 3]
    assert comparer_versions("latest") == [float("inf")]
    # 'latest' is the most recent; 3 majors < 5 so everything is kept
    assert drop_versions_sample(["latest", "1.0", "2.0"]) == []
    # ...and with 6 majors it wins a keep slot while old majors drop
    versions = ["1.0", "2.0", "3.0", "4.0", "5.0", "6.0", "latest"]
    assert drop_versions_sample(versions) == ["1.0", "2.0"]


def test_drop_versions_sample_recursion_resets_nb_to_keep():
    from datagouvfr_data_pipelines_spark.functions.validation import (
        drop_versions_sample,
    )

    versions = ["1.0", "1.1", "1.2", "1.3", "1.4", "1.5"]
    # faithful reference quirk: the single-major recursion calls itself
    # WITHOUT forwarding nb_to_keep, so the promoted pass uses the default
    # of 5 — only 1.0 drops even though the caller asked to keep 2
    assert drop_versions_sample(versions, nb_to_keep=2) == ["1.0"]
