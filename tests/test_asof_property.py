"""Property check for the as-of join idioms (operators/asof.py): both
directions compared against pandas.merge_asof — an independent executable
spec — on seeded random inputs with heavy timestamp collisions (the
regime where ordering bugs hide)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline_apache_beam_entrega1_cs_spark.operators.asof import (
    asof_join,
    asof_join_forward,
)


def _random_frames(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 60),
            "lts": rng.integers(0, 40, 60),
            "lid": np.arange(60),
        }
    )
    # right side unique on (k, ts) — the pre-aggregated shape production
    # callers use (both engines tie-break identically then)
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 5, 40),
                "rts": rng.integers(0, 40, 40),
                "val": rng.integers(0, 1000, 40),
            }
        )
        .drop_duplicates(["k", "rts"])
        .reset_index(drop=True)
    )
    return left, right


@pytest.mark.parametrize("seed", [7, 41, 1234])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, seed, direction):
    left, right = _random_frames(seed)
    sl = spark.createDataFrame(left).withColumn("lts_t", F.timestamp_seconds("lts"))
    sr = spark.createDataFrame(right).withColumn("rts_t", F.timestamp_seconds("rts"))
    fn = asof_join if direction == "backward" else asof_join_forward
    got_df = fn(
        sl,
        sr.select("k", "rts_t", "val"),
        on=["k"],
        left_ts="lts_t",
        right_ts="rts_t",
        payload_cols=["val"],
    )
    got = {
        (r["lid"], r["val"]) for r in got_df.select("lid", "val").collect()
    }

    expected_pd = pd.merge_asof(
        left.sort_values(["lts", "lid"]).reset_index(drop=True),
        right.sort_values("rts").reset_index(drop=True),
        by="k",
        left_on="lts",
        right_on="rts",
        direction=direction,
    )
    expected = {
        (int(r.lid), None if pd.isna(r.val) else int(r.val))
        for r in expected_pd.itertuples()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [7, 41, 1234])
def test_asof_nearest_matches_bruteforce_spec(spark, seed):
    """Nearest direction vs a brute-force per-row spec (argmin |dist|,
    equidistant ties -> backward) on the same collision-heavy inputs —
    including the tie rows pandas' own nearest rule would leave
    ambiguous."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.asof import (
        asof_join_nearest,
    )

    left, right = _random_frames(seed)
    sl = spark.createDataFrame(left).withColumn("lts_t", F.timestamp_seconds("lts"))
    sr = spark.createDataFrame(right).withColumn("rts_t", F.timestamp_seconds("rts"))
    got_df = asof_join_nearest(
        sl,
        sr.select("k", "rts_t", "val"),
        on=["k"],
        left_ts="lts_t",
        right_ts="rts_t",
        payload_cols=["val", "rts_t"],
    )
    got = {
        r["lid"]: (r["val"], r["asof_dir"])
        for r in got_df.select("lid", "val", "asof_dir").collect()
    }

    by_k: dict[int, list[tuple[int, int]]] = {}
    for r in right.itertuples():
        by_k.setdefault(int(r.k), []).append((int(r.rts), int(r.val)))
    for r in left.itertuples():
        cands = by_k.get(int(r.k), [])
        bwd = [(r.lts - ts, val, ts) for ts, val in cands if ts <= r.lts]
        fwd = [(ts - r.lts, val, ts) for ts, val in cands if ts >= r.lts]
        best_b = min(bwd) if bwd else None
        best_f = min(fwd) if fwd else None
        if best_b is None and best_f is None:
            want = (None, None)
        elif best_f is None or (best_b is not None and best_b[0] <= best_f[0]):
            want = (best_b[1], "bwd")
        else:
            want = (best_f[1], "fwd")
        assert got[int(r.lid)] == want, (r.lid, got[int(r.lid)], want)


@pytest.mark.parametrize("seed", [7, 41, 1234])
@pytest.mark.parametrize("tol", [0, 5, 11])
def test_asof_tolerance_matches_pandas(spark, seed, tol):
    """Tolerance cap vs pandas.merge_asof(tolerance=...) — the
    independent executable spec — on the same collision-heavy inputs;
    also checks the asof_within_tolerance flag equals payload
    presence."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.asof import (
        asof_join_tolerance,
    )

    left, right = _random_frames(seed)
    sl = spark.createDataFrame(left).withColumn("lts_t", F.timestamp_seconds("lts"))
    sr = spark.createDataFrame(right).withColumn("rts_t", F.timestamp_seconds("rts"))
    got_df = asof_join_tolerance(
        sl,
        sr.select("k", "rts_t", "val"),
        on=["k"],
        left_ts="lts_t",
        right_ts="rts_t",
        payload_cols=["val", "rts_t"],
        tolerance_s=tol,
    )
    rows = got_df.select("lid", "val", "asof_within_tolerance").collect()
    got = {(r["lid"], r["val"]) for r in rows}
    for r in rows:
        assert (r["val"] is not None) == r["asof_within_tolerance"], r

    expected_pd = pd.merge_asof(
        left.sort_values(["lts", "lid"]).reset_index(drop=True),
        right.sort_values("rts").reset_index(drop=True),
        by="k",
        left_on="lts",
        right_on="rts",
        direction="backward",
        tolerance=tol,
    )
    expected = {
        (int(r.lid), None if pd.isna(r.val) else int(r.val))
        for r in expected_pd.itertuples()
    }
    assert got == expected
