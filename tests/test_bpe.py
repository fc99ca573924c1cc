"""Distributed BPE training: sharded == single-process reference
identity, shard-layout invariance, deterministic tie-breaks, and
encode semantics."""

import numpy as np
import pandas as pd
import pytest

import ray

from baram_ray import bpe

SF = "/root/testdata/sf0.001"


def _corpus():
    return pd.DataFrame({"text": [
        "the lower the newer lower low lowest",
        "new newer newest low lower widest wide",
        "the wide wider widest new low low low",
        "unrelated words appear once only here",
    ] * 3})


def _local_ref(df, n_merges, min_freq=2):
    wf = {}
    for t in df["text"]:
        for w in str(t).lower().split():
            wf[w] = wf.get(w, 0) + 1
    return bpe.bpe_train_local(wf, n_merges, min_freq)


def test_sharded_matches_local_reference(ray_session):
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    got = bpe.bpe_train(ds, n_merges=25, min_freq=2, num_shards=3)
    ref = _local_ref(df, 25)
    assert list(zip(got["left"], got["right"], got["freq"])) == ref
    assert list(got["rank"]) == list(range(1, len(ref) + 1))


def test_shard_layout_invariance(ray_session):
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(2)
    a = bpe.bpe_train(ds, n_merges=15, num_shards=1)
    b = bpe.bpe_train(ds, n_merges=15, num_shards=5)
    pd.testing.assert_frame_equal(a, b)


def test_on_real_documents(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["text"])
    got = bpe.bpe_train(ds, n_merges=12, min_freq=2, num_shards=4)
    df = ds.to_pandas()
    ref = _local_ref(df, 12)
    assert list(zip(got["left"], got["right"], got["freq"])) == ref
    # merge frequencies never increase faster than corpus size allows
    assert (got["freq"].to_numpy() > 0).all()


def test_min_freq_stops_training(ray_session):
    df = pd.DataFrame({"text": ["ab cd ef", "gh ij kl"]})
    ds = ray.data.from_pandas(df)
    got = bpe.bpe_train(ds, n_merges=10, min_freq=3, num_shards=2)
    assert len(got) == 0
    assert list(got.columns) == ["rank", "left", "right", "freq"]


def test_encode_applies_merges_in_order():
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("w", "er</w>")]
    # without any applicable merge the word stays character-split
    assert bpe.bpe_encode("xyz", merges) == ["x", "y", "z", "</w>"]
    got = bpe.bpe_encode("low lower", merges)
    assert "".join(got).replace("</w>", " ").split() == ["low", "lower"]
    assert got[0] == "low"          # 'low' merged via (l,o)+(lo,w)


def test_encode_empty_and_case():
    assert bpe.bpe_encode("", []) == []
    assert bpe.bpe_encode("ABC", []) == bpe.bpe_encode("abc", [])


def test_encode_stage_matches_pure_encode(ray_session):
    """BpeEncodeStage token counts == len(bpe_encode(text)) per doc."""
    df = _corpus()
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    ds = ray.data.from_pandas(df).repartition(2)
    merges_df = bpe.bpe_train(ds, n_merges=20, num_shards=2)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    got = ds.map_batches(bpe.BpeEncodeStage,
                         fn_constructor_args=(merges,),
                         batch_format="pandas",
                         concurrency=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = [len(bpe.bpe_encode(t, merges)) for t in df["text"]]
    assert got["n_bpe_tokens"].tolist() == want


def test_encode_stage_memo_bounded():
    st = bpe.BpeEncodeStage([("l", "o")])
    import pandas as pd
    st(pd.DataFrame({"doc_id": [1], "text": ["lo lo lo xyz"]}))
    assert st._memo == {"lo": 2, "xyz": 4}


def test_threshold_exchange_tiny_c_still_exact(ray_session):
    """top_c=1 forces the threshold algorithm through its widening
    path every round (a shard's 1-pair report rarely certifies the
    global max) — the merge list must still be bit-identical to the
    single-process reference."""
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(3)
    got = bpe.bpe_train(ds, n_merges=25, min_freq=2, num_shards=3,
                        top_c=1)
    ref = _local_ref(df, 25)
    assert list(zip(got["left"], got["right"], got["freq"])) == ref


def test_top_pairs_threshold_semantics(ray_session):
    """Shard-side contract: top-C ordering is (count desc, pair asc);
    threshold is the C-th count, 0 when everything was reported."""
    sh = bpe.BpeShard.remote(["abab", "ab"], [3, 5])
    items, thr = ray.get(sh.top_pairs.remote(2))
    full = ray.get(sh.pair_counts.remote())
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert items == want and thr == items[-1][1]
    items_all, thr_all = ray.get(sh.top_pairs.remote(len(full) + 5))
    assert thr_all == 0 and len(items_all) == len(full)
    pairs = [p for p, _ in want] + [("zz", "qq")]
    counts = ray.get(sh.counts_of.remote(pairs))
    assert counts[:2] == [c for _, c in want] and counts[2] == 0
    ray.kill(sh)
