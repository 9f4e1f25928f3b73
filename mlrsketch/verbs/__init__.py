"""Miller-verb-shaped API: `exact` (Catalyst-planned, oracle-parity)
and `sketch` (bounded-state approximate, mergeable)."""

from mlrsketch.verbs import exact, sketch

__all__ = ["exact", "sketch"]
