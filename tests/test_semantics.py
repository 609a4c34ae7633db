"""Reference-semantics unit tests — ports the expected values of the
reference's unit suite (SURVEY.md §5.1) onto the Spark-native expressions:
hash determinism (test_normalizer.py:42+), enum defaulting (:279+), salary
swap (:360+), timestamp parsing (:431+), seniority cascade order
(seniority_extractor.py), scoring subscores (test_scoring.py:31-78),
skills extraction (test_skills_extractor.py:26-57), merge-upsert (J3).
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from job_etl_spark.functions.identity import company_id_expr, hash_key_expr
from job_etl_spark.functions.text import seniority_level_expr, validate_enum_expr
from job_etl_spark.functions.timeparse import parse_timestamp_expr
from job_etl_spark.functions.numeric import safe_double_expr, salary_bounds_exprs
from job_etl_spark.operators.merge import merge_upsert
from job_etl_spark.pipeline.enrich import SkillsDictionary, skills_expr
from job_etl_spark.pipeline.rank import (
    RankingConfig,
    RankProfile,
    RankWeights,
    rank_exprs,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("v")).first()["v"]


# ---------------------------------------------------------------------------
# U1 identity hashing
# ---------------------------------------------------------------------------
class TestHashKey:
    def test_reference_md5_parity(self, spark):
        # same algorithm as hash_generator.py: md5("acme corp|data engineer|montreal")
        expected = hashlib.md5(b"acme corp|data engineer|montreal").hexdigest()
        got = _one(
            spark,
            hash_key_expr("c", "t", "l"),
            c="Acme Corp", t="Data Engineer", l="Montreal",
        )
        assert got == expected

    def test_case_and_whitespace_insensitive(self, spark):
        a = _one(spark, hash_key_expr("c", "t", "l"),
                 c="  ACME   Corp ", t="Data\tEngineer", l="Montreal")
        b = _one(spark, hash_key_expr("c", "t", "l"),
                 c="acme corp", t="data engineer", l="montreal")
        assert a == b and len(a) == 32

    def test_company_id_null_defaults_unknown(self, spark):
        expected = hashlib.md5(b"unknown").hexdigest()
        df = spark.sql("select cast(null as string) as c")
        assert df.select(company_id_expr("c").alias("v")).first()["v"] == expected


# ---------------------------------------------------------------------------
# U2 normalization pieces
# ---------------------------------------------------------------------------
class TestEnumValidation:
    @pytest.mark.parametrize(
        "value,expected",
        [
            ("remote", "remote"),
            ("REMOTE", "remote"),
            (" Hybrid ", "hybrid"),
            ("bogus", "unknown"),
            ("", "unknown"),
            (None, "unknown"),
        ],
    )
    def test_remote_enum(self, spark, value, expected):
        df = spark.createDataFrame([(value,)], "v string")
        out = df.select(
            validate_enum_expr("v", ["remote", "hybrid", "onsite", "unknown"], "unknown").alias("o")
        ).first()["o"]
        assert out == expected


class TestRequiredFieldValidation:
    """P6 reject split — twin of the reference's per-field required-field
    cases (test_normalizer.py:234-258: missing/empty/None job_title,
    company, location each raise NormalizationError; the Spark engine
    routes those rows to the reject side-channel instead). All cases in
    one action."""

    CASES = [
        # (job_title, company, location, expect_rejected, reason_field)
        ("Data Engineer", "Acme", "Montreal", False, None),
        ("", "Acme", "Montreal", True, "job_title"),
        ("   ", "Acme", "Montreal", True, "job_title"),
        (None, "Acme", "Montreal", True, "job_title"),
        ("Data Engineer", "", "Montreal", True, "company"),
        ("Data Engineer", None, "Montreal", True, "company"),
        ("Data Engineer", "Acme", "", True, "location"),
        ("Data Engineer", "Acme", None, True, "location"),
    ]

    def test_reject_split(self, spark):
        from job_etl_spark.pipeline.normalize import normalize_common
        from job_etl_spark.schema import COMMON_SCHEMA

        rows = []
        for i, (t, c, l, _, _) in enumerate(self.CASES):
            d = {f.name: None for f in COMMON_SCHEMA.fields}
            d.update(
                provider_job_id=str(i), job_title=t, company=c, location=l,
                source="test",
            )
            rows.append(tuple(d[f.name] for f in COMMON_SCHEMA.fields))
        common = spark.createDataFrame(rows, COMMON_SCHEMA)
        res = normalize_common(common, dt.datetime(2026, 1, 1))
        ok_ids = {r["provider_job_id"] for r in res.normalized.collect()}
        rej = {r["provider_job_id"]: r["reject_reason"] for r in res.rejected.collect()}
        for i, (t, c, l, expect_rej, reason_field) in enumerate(self.CASES):
            if expect_rej:
                assert str(i) in rej and str(i) not in ok_ids, (i, t, c, l)
                assert reason_field in rej[str(i)], (i, rej[str(i)])
            else:
                assert str(i) in ok_ids and str(i) not in rej


class TestEnumSweeps:
    """Every valid enum value passes through lowercased; invalid/empty/
    non-member default to 'unknown' — the reference's accepted-values
    sweeps (test_normalizer.py:283-362) in one action per enum."""

    @pytest.mark.parametrize(
        "domain",
        [
            ["remote", "hybrid", "onsite", "unknown"],
            ["full_time", "part_time", "contract", "intern", "temp", "unknown"],
            ["1-10", "11-50", "51-200", "201-500", "501-1000", "1001-5000", "5001+", "unknown"],
        ],
        ids=["remote_type", "contract_type", "company_size"],
    )
    def test_valid_values_and_defaults(self, spark, domain):
        from job_etl_spark.schema import (
            VALID_COMPANY_SIZES,
            VALID_CONTRACT_TYPES,
            VALID_REMOTE_TYPES,
        )

        assert domain in (VALID_REMOTE_TYPES, VALID_CONTRACT_TYPES, VALID_COMPANY_SIZES)
        cases = [(v, v) for v in domain]
        cases += [(v.upper(), v) for v in domain]  # case-insensitive
        cases += [(f"  {domain[0]}  ", domain[0])]  # trimmed
        cases += [("bogus", "unknown"), ("", "unknown"), (None, "unknown")]
        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(cases)], "i int, v string"
        )
        got = {
            r["i"]: r["o"]
            for r in df.select(
                "i", validate_enum_expr("v", domain, "unknown").alias("o")
            ).collect()
        }
        for i, (raw, want) in enumerate(cases):
            assert got[i] == want, (raw, got[i], want)


class TestSalaryNormalization:
    def test_swap_when_inverted(self, spark):
        lo, hi = salary_bounds_exprs("a", "b")
        df = spark.createDataFrame([(120000.0, 80000.0)], "a double, b double")
        row = df.select(lo.alias("lo"), hi.alias("hi")).first()
        assert (row["lo"], row["hi"]) == (80000.0, 120000.0)

    def test_single_sided_passthrough(self, spark):
        lo, hi = salary_bounds_exprs("a", "b")
        df = spark.createDataFrame([(None, 90000.0)], "a double, b double")
        row = df.select(lo.alias("lo"), hi.alias("hi")).first()
        assert row["lo"] is None and row["hi"] == 90000.0

    @pytest.mark.parametrize(
        "raw,expected",
        [("80000", 80000.0), ("80000.5", 80000.5), ("abc", None), (None, None)],
    )
    def test_safe_double(self, spark, raw, expected):
        df = spark.createDataFrame([(raw,)], "v string")
        assert df.select(safe_double_expr("v").alias("o")).first()["o"] == expected


class TestTimestampParsing:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("2025-10-15T10:00:00Z", dt.datetime(2025, 10, 15, 10, 0)),
            ("2025-10-15T10:00:00+00:00", dt.datetime(2025, 10, 15, 10, 0)),
            ("2025-10-15 10:00:00", dt.datetime(2025, 10, 15, 10, 0)),
            ("1760522400", dt.datetime(2025, 10, 15, 10, 0)),  # epoch secs
            ("not-a-date", None),
            (None, None),
        ],
    )
    def test_parse(self, spark, raw, expected):
        df = spark.createDataFrame([(raw,)], "v string")
        got = df.select(
            F.unix_seconds(parse_timestamp_expr("v")).alias("o")
        ).first()["o"]
        want = None if expected is None else int(
            expected.replace(tzinfo=dt.timezone.utc).timestamp()
        )
        assert got == want


# ---------------------------------------------------------------------------
# U4 seniority cascade (fixture list from FIXTURES.md §6)
# ---------------------------------------------------------------------------
class TestSeniorityCascade:
    # all 25 reference cases evaluated in ONE Spark action — a
    # parametrized per-case action pays ~0.85 s each and blows the
    # smoke-tier budget
    CASES = [
        ("Engineer III", "senior"),
        ("Engineer II", "intermediate"),
        ("Level I", "junior"),
        ("L5 Engineer", "senior"),
        ("L4", "intermediate"),
        ("Chief Data Officer", "senior"),
        ("VP, Lead Data", "senior"),
        ("Head of Data", "senior"),
        ("Engineering Manager", "senior"),
        ("Software Intern", "junior"),
        ("Sr. Developer", "senior"),
        ("Lead Software Engineer", "senior"),
        ("Principal Engineer", "senior"),
        ("Staff Engineer", "senior"),
        ("Solutions Architect", "senior"),
        ("Architecture Specialist", "unknown"),  # word boundary!
        ("Mid-Level Developer", "intermediate"),
        ("Junior Analyst", "junior"),
        ("Jr Analyst", "junior"),
        ("Associate Engineer", "junior"),
        ("Entry Level Role", "junior"),
        ("Data Engineer", "unknown"),
        ("", "unknown"),
        (None, "unknown"),
        ("Senior Intermediate Engineer", "senior"),  # order: senior first
    ]

    def test_cascade(self, spark):
        rows = [(i, t) for i, (t, _) in enumerate(self.CASES)]
        df = spark.createDataFrame(rows, "i int, t string")
        got = {
            r["i"]: r["o"]
            for r in df.select("i", seniority_level_expr("t").alias("o")).collect()
        }
        for i, (title, expected) in enumerate(self.CASES):
            assert got[i] == expected, (title, got[i], expected)


# ---------------------------------------------------------------------------
# U5 skills extraction
# ---------------------------------------------------------------------------
class TestSkillsExtraction:
    def test_phrase_token_and_passthrough(self, spark):
        d = SkillsDictionary.load(None)  # defaults incl. "structured query language"
        df = spark.createDataFrame(
            [(
                "We use Apache Spark and Structured Query Language daily; Python too.",
                ["Kubernetes", " SQL "],
            )],
            "description string, skills_raw array<string>",
        )
        got = df.select(skills_expr("description", "skills_raw", d).alias("s")).first()["s"]
        # spark (phrase "apache spark"→spark), sql (phrase + provider alias),
        # python (token), kubernetes (unknown provider passthrough, lowered)
        assert got == ["kubernetes", "python", "spark", "sql"]

    def test_sentence_final_period_still_matches(self, spark):
        """'…with dbt.' must match alias 'dbt' — trailing dots are stripped
        from tokens (spaCy separates the period); interior dots survive
        so dotted aliases still work."""
        d = SkillsDictionary.load(None)
        df = spark.createDataFrame(
            [("Experience with dbt. Also Python...", None)],
            "description string, skills_raw array<string>",
        )
        got = df.select(skills_expr("description", "skills_raw", d).alias("s")).first()["s"]
        assert "dbt" in got and "python" in got

    def test_ml_alias_maps_to_machine_learning(self, spark):
        d = SkillsDictionary.load(None)
        df = spark.createDataFrame(
            [("Experience with ML required", None)],
            "description string, skills_raw array<string>",
        )
        got = df.select(skills_expr("description", "skills_raw", d).alias("s")).first()["s"]
        assert got == ["machine learning"]


# ---------------------------------------------------------------------------
# U7 scoring subscores (test_scoring.py parity)
# ---------------------------------------------------------------------------
def _score_row(spark, cfg, **job):
    defaults = {
        "job_title_std": None, "skills": None, "location_std": None,
        "salary_min_norm": None, "salary_max_norm": None, "remote_type": None,
        "contract_type": None, "seniority_level": None, "company_size": None,
    }
    defaults.update(job)
    df = spark.createDataFrame(
        [tuple(defaults.values())],
        "job_title_std string, skills array<string>, location_std string, "
        "salary_min_norm double, salary_max_norm double, remote_type string, "
        "contract_type string, seniority_level string, company_size string",
    )
    score, explain, sub = rank_exprs(cfg)
    row = df.select(score.alias("score"), explain.alias("explain")).first()
    return row["score"], row["explain"]


@pytest.fixture(scope="module")
def ranking_cfg():
    return RankingConfig(
        weights=RankWeights(),
        profile=RankProfile(
            title_keywords=["data engineer", "analytics engineer", "etl", "airflow", "dbt"],
            must_have_skills=["sql", "python", "looker"],
            nice_to_have_skills=["airflow", "dbt", "aws", "docker"],
            location_home="Montreal, QC, CA",
            salary_target_min=70000,
            salary_target_max=120000,
            preferred_remote=["remote", "hybrid"],
            preferred_contracts=["full_time"],
            seniority=["junior", "intermediate"],
            preferred_company_sizes=["201-500", "501-1000"],
        ),
    )


class TestScoring:
    def test_happy_path_subscores(self, spark, ranking_cfg):
        score, explain = _score_row(
            spark, ranking_cfg,
            job_title_std="Data Engineer",
            skills=["sql", "python", "looker", "airflow", "dbt"],
            location_std="Montreal, QC, CA",
            salary_min_norm=80000.0, salary_max_norm=100000.0,
            remote_type="hybrid", contract_type="full_time",
            seniority_level="intermediate", company_size="201-500",
        )
        assert explain["title_keywords"] == pytest.approx(1 / 5)
        assert explain["skills_overlap"] == pytest.approx(0.5 + 0.5 * (2 / 4))
        assert explain["location_proximity"] == 1.0
        assert explain["salary_band"] == 1.0
        assert explain["employment_type"] == 1.0
        assert explain["seniority_match"] == 1.0
        assert explain["remote_type"] == 1.0
        assert explain["company_size"] == 1.0
        w = ranking_cfg.weights
        expected = round(
            (w.title_keywords * 0.2 + w.skills_overlap * 0.75 + w.location_proximity
             + w.salary_band + w.employment_type + w.seniority_match + w.remote_type
             + w.company_size) * 100, 2)
        assert score == pytest.approx(expected)

    def test_must_have_penalty(self, spark, ranking_cfg):
        _, explain = _score_row(
            spark, ranking_cfg, skills=["sql", "python"],  # looker missing
        )
        assert explain["skills_overlap"] == pytest.approx(0.1)

    def test_salary_taper_below(self, spark, ranking_cfg):
        _, explain = _score_row(
            spark, ranking_cfg, salary_min_norm=40000.0, salary_max_norm=50000.0,
        )
        # avg 45000, dist 25000, range 50000 → 1 - 0.5 = 0.5
        assert explain["salary_band"] == pytest.approx(0.5)

    def test_salary_far_below_floors_at_0_1(self, spark, ranking_cfg):
        _, explain = _score_row(spark, ranking_cfg, salary_min_norm=1000.0,
                                salary_max_norm=2000.0)
        assert explain["salary_band"] == pytest.approx(0.1)

    def test_unknowns_are_neutral(self, spark, ranking_cfg):
        _, explain = _score_row(spark, ranking_cfg)
        for k in ["salary_band", "employment_type", "seniority_match",
                  "remote_type", "company_size"]:
            assert explain[k] == pytest.approx(0.5), k
        assert explain["skills_overlap"] == 0.0
        assert explain["location_proximity"] == 0.0

    def test_location_same_city(self, spark, ranking_cfg):
        _, explain = _score_row(spark, ranking_cfg, location_std="Montreal, Quebec")
        assert explain["location_proximity"] == pytest.approx(0.7)

    def test_location_remote_substring(self, spark, ranking_cfg):
        _, explain = _score_row(spark, ranking_cfg, location_std="Remote - Canada")
        assert explain["location_proximity"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# J3 merge-upsert
# ---------------------------------------------------------------------------
class TestMergeUpsert:
    def test_coalesce_keep_first_overwrite(self, spark):
        base = spark.createDataFrame(
            [("k1", "Old Title", "old desc", 1, 10), ("k2", "Keep", "d2", 2, 20)],
            "hash_key string, title string, description string, first_seen int, last_seen int",
        )
        updates = spark.createDataFrame(
            [("k1", "New Title", None, 5, 50), ("k3", "Fresh", "d3", 7, 70)],
            "hash_key string, title string, description string, first_seen int, last_seen int",
        )
        out = {
            r["hash_key"]: r
            for r in merge_upsert(
                base, updates, keys=["hash_key"],
                overwrite_cols=["title", "last_seen"],
                coalesce_cols=["description"],
                keep_first_cols=["first_seen"],
            ).collect()
        }
        assert len(out) == 3
        k1 = out["k1"]
        assert k1["title"] == "New Title"          # overwrite
        assert k1["description"] == "old desc"     # coalesce(new=None, old)
        assert k1["first_seen"] == 1               # keep first
        assert k1["last_seen"] == 50               # bump
        assert out["k2"]["title"] == "Keep"        # untouched base
        assert out["k3"]["title"] == "Fresh"       # insert


class TestFunnelFold:
    def test_funnel_edge_cases(self, spark):
        """The greedy fold decides EXISTS(v<c<p, p-v<=1h) exactly:
        ordering violations, window overruns, and same-instant ties all
        resolve like the strict-inequality triple join."""
        from pyspark.sql import functions as F

        from job_etl_spark.queries.relational import funnel_found_expr

        m = 60_000_000  # one minute in µs
        rank = {"purchase": 0, "click": 1, "view": 2}
        cases = {
            1: ([("view", 0), ("click", 30), ("purchase", 59)], True),
            2: ([("view", 0), ("purchase", 30), ("click", 40)], False),  # order
            3: ([("view", 0), ("click", 30), ("purchase", 61)], False),  # window
            4: ([("click", 0), ("view", 10), ("click", 20), ("purchase", 50)], True),
            5: ([("view", 0), ("click", 10), ("purchase", 10)], False),  # p ties c
            6: ([("view", 0), ("click", 0), ("purchase", 30)], False),  # c ties v
            7: ([("view", 0), ("view", 30), ("click", 50), ("purchase", 85)], True),
        }
        rows = [
            (uid, ts * m, rank[et], et)
            for uid, (evs, _) in cases.items()
            for et, ts in evs
        ]
        df = spark.createDataFrame(rows, "user_id long, ts bigint, rk int, et string")
        got = {
            r["user_id"]: r["f"]
            for r in df.groupBy("user_id")
            .agg(F.array_sort(F.collect_list(F.struct("ts", "rk", "et"))).alias("evs"))
            .select("user_id", funnel_found_expr(F.col("evs"), 3_600_000_000).alias("f"))
            .collect()
        }
        assert got == {uid: want for uid, (_, want) in cases.items()}


def test_renormalize_preserves_enrichment(spark):
    """Re-running normalize over already-enriched staging rows must NOT
    reset the enricher-owned columns (seniority_level / enrichment
    status) to their insert defaults."""
    from job_etl_spark.pipeline.normalize import merge_into_staging
    from job_etl_spark.schema import STAGING_SCHEMA

    def stage_row(seniority, status, skills):
        d = {f.name: None for f in STAGING_SCHEMA.fields}
        d.update(
            hash_key="h1", job_title="DE", company="Acme", location="MTL",
            source="mock", company_size="unknown", remote_type="unknown",
            contract_type="unknown", seniority_level=seniority,
            seniority_enrichment_status=status, skills_raw=skills,
            first_seen_at=dt.datetime(2026, 1, 1),
            last_seen_at=dt.datetime(2026, 1, 1),
        )
        return tuple(d[f.name] for f in STAGING_SCHEMA.fields)

    enriched = spark.createDataFrame([stage_row("senior", "upgraded", ["python"])], STAGING_SCHEMA)
    renorm = spark.createDataFrame(
        [stage_row("unknown", "not_tried", None)], STAGING_SCHEMA
    ).withColumn("last_seen_at", F.lit(dt.datetime(2026, 1, 2)))
    out = merge_into_staging(enriched, renorm).first()
    assert out["seniority_level"] == "senior"
    assert out["seniority_enrichment_status"] == "upgraded"
    assert out["skills_raw"] == ["python"]          # coalesce keeps enrichment
    assert out["last_seen_at"] == dt.datetime(2026, 1, 2)  # bump still happens
    # a brand-new row still gets the insert defaults
    fresh = renorm.withColumn("hash_key", F.lit("h2"))
    out2 = {r["hash_key"]: r for r in merge_into_staging(enriched, fresh).collect()}
    assert out2["h2"]["seniority_level"] == "unknown"
    assert out2["h2"]["seniority_enrichment_status"] == "not_tried"
