"""Large-scale training-data pipeline operators.

Beyond Miller's verb surface: the operations a 100 TB web-text →
training-data pipeline needs, built on the same Spark-first principles
(JVM-side expressions in the hot path, Arrow-batched Python only where
Catalyst can't express the op, broadcast for small sides, bounded state).
"""
