"""The hash-sampled threshold sweep must track the full sweep.

At 100 TB the sweep's pair stage (the full df-capped Jaccard index at
threshold 0.1) is pair-volume-bound, so ``dedup_threshold_sweep_sampled``
restricts the corpus to a deterministic md5 doc stratum before
shingling. These tests pin (a) that the stratum really shrinks the
pair work, and (b) that the sampled per-band SHARE distribution —
the thing threshold tuning actually reads — tracks the full sweep at
sf0.01 (each pair survives sampling with the same probability 1/M²,
independent of its band, so shares are unbiased).
"""

from __future__ import annotations

import pytest

from protarrow_spark.queries import all_queries

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def sweeps(spark):
    full = all_queries()["dedup_threshold_sweep"](spark, SF001).collect()
    samp = all_queries()["dedup_threshold_sweep_sampled"](spark, SF001).collect()
    return (
        {r["band"]: r["n_pairs"] for r in full},
        {r["band"]: r["n_pairs"] for r in samp},
    )


def test_sampled_sweep_is_nontrivial_and_smaller(sweeps):
    full, samp = sweeps
    assert sum(samp.values()) >= 1
    assert sum(samp.values()) < sum(full.values())
    # no band appears in the sample that the full sweep lacks
    assert set(samp) <= set(full)


def test_sampled_band_shares_track_full(sweeps):
    full, samp = sweeps
    nf, ns = sum(full.values()), sum(samp.values())
    for band, n in full.items():
        share_full = n / nf
        share_samp = samp.get(band, 0) / ns
        # loose bound: sf0.01 strata are small; the point is the knee
        # (which bands carry the mass), not 3-digit agreement
        assert abs(share_full - share_samp) <= 0.25, (band, share_full, share_samp)


def test_sampled_cumulative_knee_is_consistent(sweeps):
    """The tuning read-out: cumulative pair mass at-or-above each band
    must be monotonically comparable — the sampled cumulative share
    curve stays within tolerance of the full one."""
    full, samp = sweeps
    nf, ns = sum(full.values()), sum(samp.values())
    bands = sorted(full, reverse=True)
    cf = cs = 0
    for band in bands:
        cf += full.get(band, 0)
        cs += samp.get(band, 0)
        assert abs(cf / nf - cs / ns) <= 0.3, band
