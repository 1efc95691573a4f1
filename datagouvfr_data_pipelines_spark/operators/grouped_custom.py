"""Grouped custom operators (SURVEY §2.10 UDAF-like surface): per-group
procedural logic that genuinely can't be a column expression, run as
Arrow-batched ``applyInPandas`` — each group is a pandas DataFrame on one
executor, groups parallelize across the cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def distribution_bins_fixed(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_bins: int = 10,
    min_rows: int = 100,
    round_to: int = -2,
) -> DataFrame:
    """F6/A8: per-group quantile bins WITH the reference's rounding-collision
    repair (dvf/explore/task_functions.py:839-896): bins are rounded to
    hundreds and equal adjacent edges are nudged apart; groups under
    ``min_rows`` emit nothing (the >=100-sales floor, :1009,1069).

    The repair is a sequential walk over <= n_bins+1 values — impossible as
    a clean column expression, tiny per group: the textbook applyInPandas
    case. Output: one row per group with the repaired bin array + counts.
    """
    out_schema = (
        ", ".join(f"{c} string" for c in group_cols)
        + ", bins array<double>, volumes array<long>, n_rows long"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < min_rows:
            return pd.DataFrame(
                columns=[*group_cols, "bins", "volumes", "n_rows"]
            )
        values = pdf[value_col].to_numpy(dtype=float)
        qs = np.quantile(values, np.linspace(0, 1, n_bins + 1))
        bins = [round(float(q), round_to) if round_to >= 0 else float(np.round(q, round_to)) for q in qs]
        # collision repair: strictly increasing edges
        for i in range(1, len(bins)):
            if bins[i] <= bins[i - 1]:
                bins[i] = bins[i - 1] + max(10.0 ** (-round_to), 1.0)
        counts = np.histogram(values, bins=bins)[0]
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row.update(
            {"bins": bins, "volumes": counts.tolist(), "n_rows": len(pdf)}
        )
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(per_group, schema=out_schema)


def grouped_normalize(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group min-max normalization — a two-window column-expression op
    shown here in applyInPandas form as the template for genuinely
    procedural per-group math (prefer windows when expressible!)."""
    out_schema = (
        ", ".join(f"{c} string" for c in group_cols)
        + f", {value_col} double, normalized double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        span = v.max() - v.min()
        norm = (v - v.min()) / span if span > 0 else v * 0.0
        out = pdf[group_cols].copy()
        out[value_col] = v
        out["normalized"] = norm
        return out

    return df.groupBy(*group_cols).applyInPandas(per_group, schema=out_schema)
