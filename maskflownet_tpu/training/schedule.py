"""Piecewise-constant LR schedule with end-of-schedule termination.

Reference semantics (``pipeline.py:65-75``): the schedule is a list of
``[step_boundary, lr]`` pairs; the active lr is the first entry whose
boundary is >= the current step (strictly: advance while
``steps > boundary``); running past the last boundary ends training.
"""

from __future__ import annotations


def lr_at_step(schedule: list[tuple[int, float]], steps: int) -> float | None:
    """Return the lr for ``steps``, or None when the schedule is exhausted
    (the caller should stop training, cf. ``main.py:515-516``)."""
    i = 0
    while i < len(schedule) and steps > schedule[i][0]:
        i += 1
    if i >= len(schedule):
        return None
    return float(schedule[i][1])


def total_steps(schedule: list[tuple[int, float]]) -> int:
    return int(schedule[-1][0]) if schedule else 0
