"""MultiSketch: several named sketches updated in ONE pass, merged as one.

Miller's `summary` verb computes every per-column statistic in a single
streaming pass over the records (reference: /root/reference/pkg/
transformers/summary.go:77,237-246). This is the sketch-world analogue:
one partial/final plan whose state is a bundle {name: sketch}, so a
table is scanned ONCE however many sketches are requested — at 100 TB
the scan is the dominant cost and fusing k sketch jobs into one pass is
a ~k-fold saving (plus k-1 fewer job/stage fixed costs).

Merge is element-wise (each part merges associatively), so the bundle
itself is associative — the two-level partial/final plan in
mlrsketch.agg applies unchanged.

Serialization frames each part as (name_len, name, state_len, state);
deserialization routes each state blob by the factory mapping, so the
bundle format is independent of which sketches it carries.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Mapping


class MultiSketch:
    __slots__ = ("parts",)

    _MAGIC = b"MSK1"

    def __init__(self, parts: dict[str, object]):
        self.parts = parts

    def merge(self, other: "MultiSketch") -> "MultiSketch":
        if set(self.parts) != set(other.parts):
            raise ValueError("MultiSketch part mismatch")
        for name, sk in self.parts.items():
            sk.merge(other.parts[name])
        return self

    def serialize(self) -> bytes:
        frames = [self._MAGIC, struct.pack("<I", len(self.parts))]
        for name in sorted(self.parts):
            nb = name.encode("utf-8")
            state = self.parts[name].serialize()
            frames.append(struct.pack("<II", len(nb), len(state)))
            frames.append(nb)
            frames.append(state)
        return b"".join(frames)

    @classmethod
    def deserialize(
        cls, data: bytes, deserializers: Mapping[str, Callable[[bytes], object]]
    ) -> "MultiSketch":
        if data[:4] != cls._MAGIC:
            raise ValueError("not a MultiSketch state")
        (n,) = struct.unpack_from("<I", data, 4)
        off = 8
        parts: dict[str, object] = {}
        for _ in range(n):
            nlen, slen = struct.unpack_from("<II", data, off)
            off += 8
            name = data[off : off + nlen].decode("utf-8")
            off += nlen
            parts[name] = deserializers[name](data[off : off + slen])
            off += slen
        return cls(parts)
