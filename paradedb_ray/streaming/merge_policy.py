"""Layered (size-tiered) merge policy — the Python twin of pg_search's
``LayeredMergePolicy`` (`pg_search/src/index/merge_policy.rs:103-330`):

* layers are byte-size rungs (default 100KB -> 10GB ladder,
  `postgres/options.rs:64-71`), processed largest first;
* per layer, mergeable segments no larger than the layer are greedily
  packed (largest first) into candidates until a candidate's total
  reaches the layer size + 1/3 fudge (merged output shrinks, the fudge
  aims the result AT or ABOVE the layer so it never re-merges);
* an under-full trailing candidate is discarded;
* candidates smaller than ``min_merge_count`` (default 2) are dropped;
* a segment's effective size is scaled by its live fraction
  (``adjusted_byte_size``), so heavily-deleted segments look small and
  merge away early.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

#: `postgres/options.rs:64-71` DEFAULT_BACKGROUND_LAYER_SIZES
DEFAULT_LAYER_SIZES = (
    100 * 1024,
    1 * 1024 * 1024,
    10 * 1024 * 1024,
    100 * 1024 * 1024,
    1000 * 1024 * 1024,
    10000 * 1024 * 1024,
)


@dataclass
class SegmentInfo:
    seg_id: int
    byte_size: int
    num_docs: int
    num_deleted: int = 0

    @property
    def adjusted_byte_size(self) -> int:
        """Size scaled by the live fraction (`merge_policy.rs:356-374`)."""
        if self.num_docs == 0:
            return 0
        total = self.num_docs + self.num_deleted
        return int(self.byte_size * (self.num_docs / total))


class LayeredMergePolicy:
    def __init__(self, layer_sizes: Sequence[int] = DEFAULT_LAYER_SIZES,
                 min_merge_count: int = 2):
        self.layer_sizes = list(layer_sizes)
        self.min_merge_count = min_merge_count

    def compute_merge_candidates(
            self, segments: Sequence[SegmentInfo]) -> List[List[int]]:
        """-> list of candidates, each a list of seg_ids to merge into one
        segment (`merge_policy.rs:178-330` compute_merge_candidates)."""
        if not segments:
            return []
        by_id = {s.seg_id: s for s in segments}
        merged: set = set()
        candidates: List[tuple] = []  # (layer_size, [seg_id])

        for layer_size in sorted(self.layer_sizes, reverse=True):
            # merged output shrinks vs its inputs: fudge by a third so the
            # result lands >= the layer and never re-merges at this rung
            extended = layer_size + layer_size // 3
            avail = sorted(
                (s for s in segments if s.seg_id not in merged),
                key=lambda s: -s.adjusted_byte_size)
            cand_bytes = 0
            candidates.append((layer_size, []))
            for s in avail:
                if s.adjusted_byte_size > layer_size:
                    continue  # too big for this rung
                cand_bytes += s.byte_size
                candidates[-1][1].append(s.seg_id)
                if cand_bytes >= extended:
                    cand_bytes = 0
                    candidates.append((layer_size, []))
            if cand_bytes < extended:
                candidates.pop()  # trailing under-full candidate
            for _, ids in candidates:
                merged.update(ids)

        # drop short candidate lists (`merge_policy.rs:308-328`)
        out = [ids for _, ids in candidates
               if len(ids) >= self.min_merge_count]
        # deterministic inner ordering for stable merges
        for ids in out:
            ids.sort(key=lambda i: by_id[i].seg_id)
        return out
