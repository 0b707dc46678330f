"""Clip-count CNV interval detection (reference Clip, PhasingGraph.cpp:1103-1227).

A state machine over per-position soft/hard-clip counts (FRONT/BACK) emitting
candidate CNV intervals used to filter high-mismatch variants.
"""

from __future__ import annotations

FRONT = 0
BACK = 1
AREA_SIZE = 30000


class _State:
    __slots__ = ("push", "slow_up", "slow_down", "curr_count", "reject_count",
                 "pull_down_count", "slow_down_count", "start", "end")

    def __init__(self):
        self.reset()

    def reset(self):
        self.push = False
        self.slow_up = False
        self.slow_down = False
        self.curr_count = 0
        self.reject_count = 0
        self.pull_down_count = 0
        self.slow_down_count = 0
        self.start = -1
        self.end = -1

    def update_threshold(self, up_count: int):
        """PhasingGraph.cpp:1112-1126."""
        self.reject_count = up_count
        if up_count >= 20:
            self.pull_down_count = up_count // 2
            self.slow_down_count = 5
        elif up_count >= 10:
            self.pull_down_count = up_count // 2
            self.slow_down_count = up_count // 4
        else:
            self.pull_down_count = 5
            self.slow_down_count = 2


def get_cnv_intervals(clip_count: dict[int, list[int]]) -> list[tuple[int, int]]:
    """Clip::getCNVInterval (PhasingGraph.cpp:1128-1226).

    The reference appends a sentinel entry at last_pos + 30000 (copying the
    last entry's counts) before scanning, then erases it.
    """
    if not clip_count:
        return []
    cnv: list[tuple[int, int]] = []
    state = _State()
    items = sorted(clip_count.items())
    last_pos, last_counts = items[-1]
    sentinel_pos = last_pos + AREA_SIZE
    scan = items + [(sentinel_pos, list(last_counts))]
    # note: if sentinel_pos collides with an existing key the reference's map
    # insert is a no-op; positions are ints so collision cannot happen here
    # (sentinel is strictly greater than the max key).

    for pos, counts in scan:
        up = counts[FRONT]
        down = counts[BACK]

        if not state.push and not state.slow_down and not state.slow_up:
            if up >= 5 and state.curr_count == 0:
                state.push = True
                state.slow_up = False
                state.slow_down = True
                state.curr_count = up - down
                state.start = pos
                state.end = pos + AREA_SIZE
                state.update_threshold(up)
            elif up > down and state.curr_count == 0:
                state.push = False
                state.slow_up = True
                state.slow_down = False
                state.curr_count = up - down
                state.start = pos
                state.end = pos + AREA_SIZE
        elif state.push and state.slow_down:
            if up > state.reject_count:
                state.push = True
                state.slow_up = False
                state.slow_down = True
                state.update_threshold(up)
                state.start = pos
                state.end = pos + AREA_SIZE
            state.curr_count += up - down
            if state.curr_count > 30:
                state.end = pos + AREA_SIZE
            if down >= state.pull_down_count:
                cnv.append((state.start, pos))
                state.reset()
            elif state.curr_count <= state.slow_down_count and pos <= state.end:
                cnv.append((state.start, pos))
                state.reset()
            if pos > state.end or state.curr_count <= 0 or pos - state.start >= 200000:
                state.reset()
        elif state.slow_up:
            if (down >= state.curr_count // 4) if state.curr_count > 20 else (down >= 5):
                cnv.append((state.start, pos))
                state.reset()
            elif up >= 5:
                state.push = True
                state.slow_up = False
                state.slow_down = True
                state.curr_count = up - down
                state.start = pos
                state.end = pos + AREA_SIZE
                state.update_threshold(up)
            else:
                state.curr_count += up - down
                if state.curr_count > 30:
                    state.end = pos + AREA_SIZE
                if pos > state.end or state.curr_count <= 0 or pos - state.start >= 200000:
                    state.reset()
    return cnv
