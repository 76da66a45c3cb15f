"""The full-registry dual-SF GROWTH sweep baseline (VERDICT r13
item 2): the newest committed GROWTH_r<N>.json must cover EVERY
registry entry, contain no errored rows, and every entry over the
absolute floor whose big/small growth exceeds the ratio threshold must
carry a `growth_waivers` adjudication that is ALSO written up in
SCALING.md. Growth is the number that separates a fixed-stage cost
(growth ~1× over 100× data) from a genuine scale-killer (the round-12
eval-panel quadratic grew with the corpus while its sweep time looked
"adjudicated-fixed") — the timing sweep alone cannot tell them apart,
so this gate makes the distinction a standing, mechanized check.

Noise direction (mirrors tests/test_sweep_baseline.py after ADVICE
r13): only a noisy CURRENT window can fake a growth failure (ambient
inflation on the big side inflates the ratio), so noise downgrades
failures to a skip; a clean pass is conservative either way because
inflation pushes toward false failures on the big side.
"""

from __future__ import annotations

import glob
import json
import os
import re

from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# An entry is flagged only when BOTH trip: the big side is over the
# absolute floor (sub-second entries are fixed-overhead-dominated and
# their ratios are jitter) AND growth exceeds the ratio.
GROWTH_RATIO = 3.0
BIG_FLOOR_S = 1.0
# Noisy-machine guard (same posture as the timing sweep's gate).
_MAX_STEAL_S = 1.0
_MAX_LOAD = 8.0


def _growths_by_round() -> list[tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(REPO, "GROWTH_*.json")):
        if p.endswith(".jsonl"):
            continue
        m = re.search(r"GROWTH_r(\d+)", os.path.basename(p))
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _newest_growth() -> tuple[str, dict]:
    growths = _growths_by_round()
    assert growths, (
        "no committed GROWTH_r<N>.json baseline (run "
        "`python growth_sweep.py GROWTH_r<N>.json`)"
    )
    path = growths[-1][1]
    return path, _load(path)


def _noisy(data: dict) -> str | None:
    steal = data.get("steal_delta_s")
    load = data.get("load_avg_start")
    # Scale the steal threshold off what the sweep EXECUTED in the
    # session that accrued the steal: steal_basis_s (per-session, the
    # honest basis on a resumed sweep — ADVICE r14), falling back to
    # the all-sessions totals for older artifacts. ~5% self-burn steal
    # is normal for a dual-SF sweep.
    # Distinguish missing from zero (ADVICE r15): a fully-resumed sweep
    # that executed nothing this session writes steal_basis_s=0.0, and a
    # truthiness fallback would silently switch to the all-sessions
    # total — re-inflating the basis exactly when the execution window
    # was tiny.
    b = data.get("steal_basis_s")
    basis = (
        float(b)
        if b is not None
        else float(
            data.get("total_all_runs_s")
            or data.get("total_big_min_s")
            or 0
        )
    )
    limit = max(_MAX_STEAL_S, 0.05 * basis)
    if steal is not None and steal > limit:
        return f"steal_delta_s={steal} (limit {round(limit, 1)})"
    if load is not None and load > _MAX_LOAD:
        return f"load_avg_start={load}"
    return None


def test_growth_baseline_covers_registry():
    path, data = _newest_growth()
    missing = sorted(set(all_queries()) - set(data["entries"]))
    assert not missing, (
        f"{len(missing)} registry entries absent from "
        f"{os.path.basename(path)} — run `python growth_sweep.py "
        f"{os.path.basename(path)}` (resumable; only measures the "
        f"missing names): {missing}"
    )


def test_growth_baseline_has_no_errors():
    path, data = _newest_growth()
    bad = sorted(n for n, r in data["entries"].items() if "error" in r)
    assert not bad, f"errored growth rows in {os.path.basename(path)}: {bad}"


def test_growth_waivers_are_adjudicated_in_scaling_md():
    """Every growth waiver must point at a real SCALING.md write-up —
    a waiver is an adjudication record, not a mute button."""
    _, data = _newest_growth()
    waivers = data.get("growth_waivers", {})
    if not waivers:
        return
    with open(os.path.join(REPO, "SCALING.md")) as f:
        scaling = f.read()
    unadjudicated = sorted(n for n in waivers if n not in scaling)
    assert not unadjudicated, (
        "growth_waivers entries with no SCALING.md adjudication: "
        f"{unadjudicated}"
    )


def test_no_unadjudicated_superlinear_growth():
    import pytest

    path, data = _newest_growth()
    noisy = _noisy(data)
    waived = set(data.get("growth_waivers", {}))
    offenders = []
    for name, rec in data["entries"].items():
        if name in waived:
            continue
        g, big = rec.get("growth", -1), rec.get("big_min", -1)
        if g > GROWTH_RATIO and big >= BIG_FLOOR_S:
            offenders.append(
                f"{name}: {rec['small_min']}s -> {big}s (x{g})"
            )
    if offenders and noisy:
        pytest.skip(
            f"apparent superlinear growth on a noisy window ({noisy}) — "
            f"re-measure quiet before adjudicating: {offenders}"
        )
    assert not offenders, (
        f"registry entries with growth > {GROWTH_RATIO}x over 100x data "
        f"and big-side >= {BIG_FLOOR_S}s, with no adjudication "
        f"(re-measure quiet — delete the entry's line from "
        f"{os.path.basename(path)}.jsonl and rerun growth_sweep.py — or "
        f"adjudicate in SCALING.md and add a growth_waivers entry): "
        + "; ".join(sorted(offenders))
    )


def test_growth_gate_logic_on_synthetic_artifacts(tmp_path, monkeypatch):
    """Unit-test the gate's decision table on synthetic growth files:
    (a) an unadjudicated superlinear entry FAILS on a quiet window;
    (b) the same entry is excused (skip) on a noisy CURRENT window;
    (c) a waived entry passes only when SCALING.md mentions it;
    (d) superlinear growth UNDER the absolute big-side floor passes."""
    import json as _json

    import pytest

    import tests.test_growth_baseline as gb

    def write(entries, steal=0.0, waivers=None, total=100.0):
        p = tmp_path / "GROWTH_r99.json"
        p.write_text(_json.dumps({
            "sf_small": "0.001", "sf_big": "0.1",
            "total_big_min_s": total, "steal_delta_s": steal,
            "load_avg_start": 0.5, "growth_waivers": waivers or {},
            "entries": {
                n: {"small_min": s, "big_min": b,
                    "growth": round(b / s, 2)}
                for n, (s, b) in entries.items()
            },
        }))

    monkeypatch.setattr(gb, "REPO", str(tmp_path))
    (tmp_path / "SCALING.md").write_text(
        "## growth adjudications\n\nx: data-proportional, healthy.\n"
    )

    # (a) quiet + superlinear over the floor -> AssertionError
    write({"x": (0.5, 5.0), "y": (0.5, 0.6)})
    with pytest.raises(AssertionError, match="x: 0.5s -> 5.0s"):
        gb.test_no_unadjudicated_superlinear_growth()

    # (b) noisy current window -> skip, not fail
    write({"x": (0.5, 5.0), "y": (0.5, 0.6)}, steal=50.0)
    with pytest.raises(pytest.skip.Exception):
        gb.test_no_unadjudicated_superlinear_growth()

    # (c) waived + mentioned in SCALING.md -> pass both gates
    write({"x": (0.5, 5.0), "y": (0.5, 0.6)},
          waivers={"x": "data-proportional, adjudicated"})
    gb.test_no_unadjudicated_superlinear_growth()
    gb.test_growth_waivers_are_adjudicated_in_scaling_md()

    # (c2) waived but NOT in SCALING.md -> the waiver audit fails
    write({"z": (0.5, 5.0)}, waivers={"z": "trust me"})
    with pytest.raises(AssertionError, match="no SCALING.md adjudication"):
        gb.test_growth_waivers_are_adjudicated_in_scaling_md()

    # (d) big ratio under the absolute big-side floor -> pass
    write({"w": (0.05, 0.4)})
    gb.test_no_unadjudicated_superlinear_growth()
