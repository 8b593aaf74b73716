"""Property tests for the Misra-Gries summary behind agg_heavy_hitters.

The two-phase plan (per-partition MG sketch → exact verify) is only
exact because of the SUPERSET guarantee: the union of partition
summaries must contain every item whose global frequency is ≥ N/k,
under ANY partitioning of the stream and ANY batch boundaries. These
tests drive that claim with randomized streams — pure Python, no Spark,
hundreds of examples per run."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_etl_aws_spark.operators.sketch import misra_gries_update

STREAMS = st.lists(
    st.sampled_from([f"t{i}" for i in range(12)]), min_size=1, max_size=400
)


def summarize(stream: list[str], batch_bounds: list[int], k: int) -> set:
    """Run the stream through MG with the given batch split points."""
    counters: dict[str, int] = {}
    bounds = sorted({b % (len(stream) + 1) for b in batch_bounds})
    prev = 0
    for b in [*bounds, len(stream)]:
        batch = stream[prev:b]
        prev = b
        if batch:
            counters = misra_gries_update(counters, Counter(batch), k)
    return set(counters)


@settings(max_examples=300, deadline=None)
@given(
    stream=STREAMS,
    k=st.integers(min_value=1, max_value=8),
    n_parts=st.integers(min_value=1, max_value=5),
    bounds=st.lists(st.integers(min_value=0, max_value=400), max_size=6),
)
def test_partition_union_is_superset_of_true_heavy_hitters(
    stream, k, n_parts, bounds
):
    """Split the stream round-robin into partitions, summarize each with
    arbitrary batch boundaries, union the survivors: every item with
    global count*k >= N must be present — the exact property the verify
    phase of agg_heavy_hitters relies on."""
    parts = [stream[i::n_parts] for i in range(n_parts)]
    union: set = set()
    for part in parts:
        union |= summarize(part, bounds, k)
    total = len(stream)
    truth = {
        item for item, c in Counter(stream).items() if c * k >= total
    }
    assert truth <= union, (
        f"lost heavy hitters {truth - union} (k={k}, N={total})"
    )


@settings(max_examples=200, deadline=None)
@given(stream=STREAMS, k=st.integers(min_value=1, max_value=8))
def test_summary_never_exceeds_k_counters(stream, k):
    counters: dict[str, int] = {}
    for item in stream:  # worst case: one-item batches
        counters = misra_gries_update(counters, {item: 1}, k)
        assert len(counters) <= k
        assert all(c > 0 for c in counters.values())
