"""Shared statistics for the fleet-vs-sequential compare scripts
(`fleet_u_sweep_compare.py`, `fleet_gate_compare.py`) — one home for the
gate arithmetic so a fix lands everywhere at once."""
import math


def stats(vals):
    """(mean, sd, sem); sd/sem are 0.0 at n=1."""
    n = len(vals)
    m = sum(vals) / n
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (n - 1)) if n > 1 \
        else 0.0
    return m, sd, sd / math.sqrt(n) if n > 1 else 0.0


def diff_over_se(d, se):
    """d/se with the zero-SE edge handled: at zero joint SE (n=1 or tied
    values) any nonzero diff is infinitely many SEs — flag it, never
    report +0.00."""
    if se == 0:
        return 0.0 if d == 0 else float("inf")
    return d / se
