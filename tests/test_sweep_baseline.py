"""The full-registry timing-sweep baseline must stay in lockstep with
the registry (VERDICT r11 item 3 made the sweep a standing ritual; this
test makes skipping it impossible, the same forcing-function move as
tests/test_rotation.py): the newest committed SWEEP_*.json must cover
EVERY registry entry (an entry added without re-running
`python registry_sweep.py <newest>` fails here — the resumable sweep
only measures the missing names, so the fix is one command) and must
contain no errored rows."""

from __future__ import annotations

import glob
import json
import os

from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_sweep() -> tuple[str, dict]:
    paths = glob.glob(os.path.join(REPO, "SWEEP_*.json"))
    paths = [p for p in paths if not p.endswith(".jsonl")]
    assert paths, "no committed sweep baseline (run registry_sweep.py)"
    newest = max(paths, key=os.path.getmtime)
    with open(newest) as f:
        return newest, json.load(f)


def test_sweep_baseline_covers_registry():
    path, data = _newest_sweep()
    missing = sorted(set(all_queries()) - set(data["entries"]))
    assert not missing, (
        f"{len(missing)} registry entries absent from {os.path.basename(path)} "
        f"— run `python registry_sweep.py {os.path.basename(path)}` "
        f"(resumable; only sweeps the missing names): {missing}"
    )


def test_sweep_baseline_has_no_errors():
    path, data = _newest_sweep()
    bad = sorted(n for n, r in data["entries"].items() if "error" in r)
    assert not bad, f"errored sweep rows in {os.path.basename(path)}: {bad}"
