"""CountMin sketch: one-sided error bound, mergeability, and estimate
determinism (the SQL-oracle hash-exactness is covered by the
events_user_freq_cms parity test)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from baram_ray.sketches import (CMS_SEEDS, CMS_W, cms_estimate, cms_merge,
                                cms_partial)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12),
                min_size=1, max_size=400))
def test_one_sided_and_bounded(keys):
    ks = np.asarray(keys, dtype=np.int64)
    cms = cms_partial(ks)
    uniq, true = np.unique(ks, return_counts=True)
    est = cms_estimate(cms, uniq)
    assert (est >= true).all()                     # never underestimates
    assert (est <= len(ks)).all()                  # counter ≤ N always


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=2, max_size=300),
       st.integers(min_value=1, max_value=299))
def test_merge_equals_single_pass(keys, cut):
    ks = np.asarray(keys, dtype=np.int64)
    cut = min(cut, len(ks) - 1)
    merged = cms_merge([cms_partial(ks[:cut]), cms_partial(ks[cut:])])
    assert (merged == cms_partial(ks)).all()


def test_shape_and_determinism():
    ks = np.arange(1000, dtype=np.int64)
    a, b = cms_partial(ks), cms_partial(ks)
    assert a.shape == (len(CMS_SEEDS), CMS_W)
    assert (a == b).all()
    assert a.sum() == len(CMS_SEEDS) * len(ks)     # every key hits every row
