"""Ranking stage (reference parity: U7, ``services/ranker/scoring.py:16-391``
+ config ``config/ranking.yml`` loader ``services/ranker/config_loader.py``).

All 8 subscores are native column expressions; the explain dict becomes a
``map<string,double>`` column. Exact-match semantics preserved:

- title: matched_keywords/total (substring, case-insensitive); empty title
  or no keywords → 0.0
- skills: no skills → 0.0; any must-have missing → 0.1; all must-haves and
  no nice-to-have defined → 0.8; else 0.5 + 0.5·(nice matches/total nice)
- location: exact (case-insensitive) → 1.0; same first comma-part → 0.7;
  'remote' substring → 0.5; else 0.0
- salary: avg of present bounds; in target range → 1.0; outside →
  max(0.1, 1 − min(dist/range, 1)); no info → 0.5. NB the reference uses
  Python truthiness — salary of 0 counts as missing; preserved here.
- remote: unknown/missing → 0.5; in preferred → 1.0; else 0.0
- contract: unknown/missing → 0.5; preferred → 1.0; else 0.3
- seniority: unknown/missing → 0.5; preferred → 1.0; else 0.3
- company_size: unknown/missing → 0.5; preferred (exact) → 1.0; else 0.7
- total: clamp(round(Σ wᵢ·sᵢ·100, 2), 0, 100)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RankWeights:
    title_keywords: float = 0.25
    skills_overlap: float = 0.30
    location_proximity: float = 0.10
    salary_band: float = 0.15
    employment_type: float = 0.05
    seniority_match: float = 0.07
    remote_type: float = 0.04
    company_size: float = 0.04


@dataclass
class RankProfile:
    title_keywords: list[str] = field(default_factory=list)
    must_have_skills: list[str] = field(default_factory=list)
    nice_to_have_skills: list[str] = field(default_factory=list)
    location_home: str = ""
    salary_target_min: float = 0.0
    salary_target_max: float = 0.0
    preferred_remote: list[str] = field(default_factory=list)
    preferred_contracts: list[str] = field(default_factory=list)
    seniority: list[str] = field(default_factory=list)
    preferred_company_sizes: list[str] = field(default_factory=list)


def default_profile() -> RankProfile:
    """The reference's shipped profile (config/ranking.yml:14-26)."""
    return RankProfile(
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
    )


@dataclass
class RankingConfig:
    weights: RankWeights = field(default_factory=RankWeights)
    profile: RankProfile = field(default_factory=default_profile)

    @classmethod
    def load(cls, path: str | Path) -> "RankingConfig":
        with Path(path).open("r", encoding="utf-8") as fh:
            raw = yaml.safe_load(fh) or {}
        w = raw.get("weights") or {}
        p = raw.get("profile") or {}
        sal = p.get("salary_target_cad") or {}
        return cls(
            weights=RankWeights(**{k: float(v) for k, v in w.items()}),
            profile=RankProfile(
                title_keywords=list(p.get("title_keywords") or []),
                must_have_skills=list(p.get("must_have_skills") or []),
                nice_to_have_skills=list(p.get("nice_to_have_skills") or []),
                location_home=p.get("location_home") or "",
                salary_target_min=float(sal.get("min", 0.0)),
                salary_target_max=float(sal.get("max", 0.0)),
                preferred_remote=list(p.get("preferred_remote") or []),
                preferred_contracts=list(p.get("preferred_contracts") or []),
                seniority=list(p.get("seniority") or []),
                preferred_company_sizes=list(p.get("preferred_company_sizes") or []),
            ),
        )


def _lower_arr(values: list[str]) -> Column:
    return F.array(*[F.lit(v.lower()) for v in values])


def title_score_expr(title: Column, keywords: list[str]) -> Column:
    if not keywords:
        return F.lit(0.0)
    t = F.lower(title)
    matched = sum(
        (t.contains(kw.lower())).cast("int") for kw in keywords
    )
    score = matched / F.lit(float(len(keywords)))
    return F.when(title.isNull() | (title == ""), 0.0).otherwise(score)


def skills_score_expr(skills: Column, must: list[str], nice: list[str]) -> Column:
    sk = F.transform(skills, F.lower)
    must_arr, nice_arr = _lower_arr(must), _lower_arr(nice)
    must_matches = F.size(F.array_intersect(F.array_distinct(must_arr), sk))
    # NB array_intersect dedups; reference counts each listed must-have —
    # duplicate entries in config are pathological, distinct matches intent
    all_must = must_matches >= F.lit(len(set(m.lower() for m in must)))
    nice_matches = F.size(F.array_intersect(F.array_distinct(nice_arr), sk))
    n_nice = len(set(n.lower() for n in nice))
    nice_score = (
        F.lit(0.8)
        if n_nice == 0
        else F.lit(0.5) + F.lit(0.5) * (nice_matches / F.lit(float(n_nice)))
    )
    return (
        F.when(skills.isNull() | (F.size(skills) == 0), 0.0)
        .when(~all_must, 0.1)
        .otherwise(nice_score)
    )


def location_score_expr(location: Column, home: str) -> Column:
    if not home:
        return F.lit(0.0)
    loc = F.lower(location)
    home_l = home.lower()
    home_city = home_l.split(",")[0].strip()
    city = F.trim(F.split(loc, ",").getItem(0))
    return (
        F.when(location.isNull() | (location == ""), 0.0)
        .when(loc == home_l, 1.0)
        .when(city == home_city, 0.7)
        .when(loc.contains("remote"), 0.5)
        .otherwise(0.0)
    )


def salary_score_expr(sal_min: Column, sal_max: Column, tmin: float, tmax: float) -> Column:
    # Python-truthiness parity: 0 counts as missing (scoring.py:366 `if not`)
    has_min = sal_min.isNotNull() & (sal_min != 0)
    has_max = sal_max.isNotNull() & (sal_max != 0)
    avg = (
        F.when(has_min & has_max, (sal_min + sal_max) / 2)
        .when(has_min, sal_min)
        .otherwise(sal_max)
    )
    rng = tmax - tmin
    below = F.lit(tmin) - avg
    above = avg - F.lit(tmax)
    dist = F.when(avg < tmin, below).otherwise(above)
    # degenerate target range (min==max) → full penalty; avoids ANSI
    # divide-by-zero (the reference would crash here; a profile with a
    # zero-width band means any out-of-band salary is maximally distant)
    penalty = F.least(dist / F.lit(rng), F.lit(1.0)) if rng > 0 else F.lit(1.0)
    taper = F.greatest(F.lit(0.1), F.lit(1.0) - penalty)
    return (
        F.when(~has_min & ~has_max, 0.5)
        .when((avg >= tmin) & (avg <= tmax), 1.0)
        .otherwise(taper)
    )


def _preference_score(col: Column, preferred: list[str], miss: float) -> Column:
    return (
        F.when(col.isNull() | (F.lower(col) == "unknown") | (col == ""), 0.5)
        .when(F.lower(col).isin([p.lower() for p in preferred]), 1.0)
        .otherwise(miss)
    )


def company_size_score_expr(size: Column, preferred: list[str]) -> Column:
    # exact (case-sensitive) membership per the reference (scoring.py:287)
    return (
        F.when(size.isNull() | (size == "unknown") | (size == ""), 0.5)
        .when(size.isin(preferred), 1.0)
        .otherwise(0.7)
    )


def rank_exprs(cfg: RankingConfig) -> tuple[Column, Column, dict[str, Column]]:
    """Returns (rank_score, rank_explain map, subscore dict) over a fact-shaped
    DataFrame with columns job_title_std, skills, location_std,
    salary_min_norm, salary_max_norm, remote_type, contract_type,
    seniority_level, company_size."""
    p, w = cfg.profile, cfg.weights
    sub = {
        "title_keywords": title_score_expr(F.col("job_title_std"), p.title_keywords),
        "skills_overlap": skills_score_expr(
            F.col("skills"), p.must_have_skills, p.nice_to_have_skills
        ),
        "location_proximity": location_score_expr(F.col("location_std"), p.location_home),
        "salary_band": salary_score_expr(
            F.col("salary_min_norm"),
            F.col("salary_max_norm"),
            p.salary_target_min,
            p.salary_target_max,
        ),
        "employment_type": _preference_score(
            F.col("contract_type"), p.preferred_contracts, 0.3
        ),
        "seniority_match": _preference_score(F.col("seniority_level"), p.seniority, 0.3),
        "remote_type": _preference_score(F.col("remote_type"), p.preferred_remote, 0.0),
        "company_size": company_size_score_expr(
            F.col("company_size"), p.preferred_company_sizes
        ),
    }
    weighted = (
        w.title_keywords * sub["title_keywords"]
        + w.skills_overlap * sub["skills_overlap"]
        + w.location_proximity * sub["location_proximity"]
        + w.salary_band * sub["salary_band"]
        + w.employment_type * sub["employment_type"]
        + w.seniority_match * sub["seniority_match"]
        + w.remote_type * sub["remote_type"]
        + w.company_size * sub["company_size"]
    )
    # clamp(round(x·100, 2), 0, 100) — scoring.py:366-367; round through
    # decimal for engine-exact HALF_UP-equivalent rounding
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(100.0), F.round((weighted * 100).cast("decimal(24,10)"), 2).cast("double")
        ),
    )
    explain = F.create_map(
        *[x for name in sub for x in (F.lit(name), sub[name])]
    )
    return score, explain, sub


def rank_jobs(fact: DataFrame, dim: DataFrame | None, cfg: RankingConfig) -> DataFrame:
    """S9+U7+J6: join dim for company_size (broadcast — dims are small),
    compute score+explain, return fact with rank columns filled."""
    df = fact
    if dim is not None and "company_size" in dim.columns:
        df = df.join(
            F.broadcast(dim.select("company_id", "company_size")), "company_id", "left"
        )
    elif "company_size" not in df.columns:
        df = df.withColumn("company_size", F.lit(None).cast("string"))
    score, explain, _ = rank_exprs(cfg)
    out = df.withColumns({"rank_score": score, "rank_explain": explain})
    return out.drop("company_size") if dim is not None else out
