"""Mechanized driver-window composition check (round-10 VERDICT item 5;
computation shared with plans/rotation.py per round-11 VERDICT item 7).

The driver's per-round correctness gate reads the FIRST 50 registry
entries. Twice (rounds 7 and 9) a hand-maintained DRIVER_PRIORITY
undercounted the never-driver-checked backlog and spent front slots on
already-checked entries while unchecked ones waited — caught only by
judge review. These tests derive the never-checked set from the
CORRECTNESS_r*.json evidence files — via the SAME helpers the
human-facing chore generator uses (`plans/rotation.py`), so the chore
text and this gate cannot drift — and fail the suite if the front of
DRIVER_PRIORITY wastes a slot:

- every DRIVER_PRIORITY name must exist in the registry (no ghosts);
- if there are >= 50 never-checked entries, all 50 front slots must be
  never-checked entries;
- if there are fewer, the first len(never) slots must be EXACTLY the
  never-checked set (order within the front is free — that's the
  heaviest-first judgment call — but membership is not).
"""

from __future__ import annotations

from pipeline_apache_beam_entrega1_cs_spark.plans.registry import (
    DRIVER_PRIORITY,
    all_queries,
)
from pipeline_apache_beam_entrega1_cs_spark.plans.rotation import (
    WINDOW,
    compose_window,
    driver_checked,
    pending,
)


def test_driver_priority_has_no_ghosts():
    reg = set(all_queries())
    ghosts = [n for n in DRIVER_PRIORITY if n not in reg]
    assert not ghosts, f"DRIVER_PRIORITY names not in registry: {ghosts}"


def test_driver_priority_front_spends_no_slot_on_checked_entries():
    never = set(pending())
    front = DRIVER_PRIORITY[: min(WINDOW, len(DRIVER_PRIORITY))]
    if len(never) >= WINDOW:
        wasted = [n for n in front if n not in never]
        assert not wasted, (
            f"{len(never)} entries have no driver evidence, but these "
            f"front-window slots hold already-checked entries: {wasted}"
        )
    else:
        front_exact = set(DRIVER_PRIORITY[: len(never)])
        missing = never - front_exact
        assert not missing, (
            "never-driver-checked entries not at the front of "
            f"DRIVER_PRIORITY: {sorted(missing)}"
        )


def test_correctness_history_has_no_ghost_names():
    """Every name the driver ever checked must still exist — a renamed
    or deleted entry would silently orphan its evidence trail."""
    reg = set(all_queries())
    ghosts = sorted(set(driver_checked()) - reg)
    assert not ghosts, f"CORRECTNESS history names missing from registry: {ghosts}"


def test_window_is_exactly_the_composed_proposal_when_no_pending():
    """VERDICT r12 item 4: with an empty pending set the 50-slot window
    must be BYTE-EXACTLY the mechanized stalest-first proposal — no
    hand-picked deviations. (With pending entries the weaker
    pending-first membership test above governs, because the builder
    may order the pending block heaviest-first by judgment.) Because
    compose_window() ranks within a staleness class by current
    DRIVER_PRIORITY order, this reduces to: the front 50 are exactly
    the 50 stalest entries."""
    if pending():
        return  # membership gate above governs mid-round additions
    assert DRIVER_PRIORITY[:WINDOW] == compose_window(), (
        "ROTATION CHORE ALARM (intended, not a product bug): the "
        "committed DRIVER_PRIORITY front window no longer matches the "
        "mechanized stalest-first proposal. This fires BY DESIGN the "
        "moment the driver drops a new CORRECTNESS_r{N}.json after a "
        "round, because that evidence shifts the staleness ranking — "
        "it is the start-of-round order to rotate the window. Fix: "
        "run `python -m pipeline_apache_beam_entrega1_cs_spark.plans."
        "rotation` and make DRIVER_PRIORITY[:50] byte-exactly its "
        "proposal (VERDICT r13 item 1)."
    )


def test_composed_window_is_valid_and_pending_first():
    """The chore generator's proposal must itself satisfy the gate:
    registry-valid names, no duplicates, pending entries first."""
    reg = set(all_queries())
    win = compose_window()
    assert len(win) == min(WINDOW, len(reg))
    assert len(set(win)) == len(win), "composed window has duplicates"
    assert all(n in reg for n in win)
    pend = pending()
    assert win[: min(len(pend), WINDOW)] == pend[:WINDOW]
