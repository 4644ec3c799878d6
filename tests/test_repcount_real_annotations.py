"""RepcountHelper against the REAL RepCount annotation pack.

The reference repo ships the actual `datasets/RepCount/annotation.csv`
(884 videos) and pins hard oracles on it in its own test suite
(reference tests/test_repcount_dataset.py:49-64: split sizes train=602 /
val=110 / test=115 over the six actions, named-video membership, rep
ordering). Running OUR RepcountHelper over THAT csv is the strongest
annotation-layer parity check available in this image (videos/rawframes
themselves are not present — zero egress).

The pack is read in place from the read-only reference mount; nothing is
copied. Skipped when the mount is absent.
"""

import os

import pytest

from workoutdetector_tpu.data.repcount import ACTIONS, RepcountHelper

REF_ANNO = "/root/reference/datasets/RepCount/annotation.csv"
SPLITS = ["train", "val", "test"]

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_ANNO),
                                reason="reference annotation pack not mounted")


@pytest.fixture(scope="module")
def helper(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("repcount_root"))
    return RepcountHelper(root, REF_ANNO)


def test_split_sizes_match_shipped_pack(helper):
    """Pinned to the SHIPPED annotation.csv (884 rows, 7 classes).

    NOTE: the reference's own oracle (tests/test_repcount_dataset.py:49-55,
    train=602/val=110/test=115) does not match the pack its repo ships —
    neither over its helper's 6 actions (545/100/117) nor the test file's
    7 (636/113/135); the hard-coded sizes date to an earlier annotation
    revision. We pin the real file so a silently-changed pack is caught."""
    assert len(helper.get_rep_data(["train"], ACTIONS)) == 545
    assert len(helper.get_rep_data(["val"], ACTIONS)) == 100
    assert len(helper.get_rep_data(["test"], ACTIONS)) == 117
    assert sum(len(helper.get_rep_data([s], ACTIONS)) for s in SPLITS) == 762


def test_named_videos_present_with_classes(helper):
    # reference tests/test_repcount_dataset.py:21-25
    all_ = helper.get_rep_data(SPLITS, ACTIONS)
    assert "stu4_57.mp4" in all_
    assert "stu2_48.mp4" in all_
    assert all_["stu2_48.mp4"].class_ == "situp"
    assert all_["stu4_57.mp4"].class_ == "situp"


def test_action_filter_partitions_each_split(helper):
    # sum over single-action queries == the all-action query, per split
    for sp in SPLITS:
        total = len(helper.get_rep_data([sp], ["all"]))
        by_action = sum(
            len(helper.get_rep_data([sp], [a])) for a in ACTIONS)
        assert total == by_action


def test_rep_boundaries_well_ordered(helper):
    # reference tests/test_repcount_dataset.py:57-64: start < end within a
    # rep, and rep ends are non-decreasing
    all_ = helper.get_rep_data(SPLITS, ACTIONS)
    assert len(all_) == 545 + 100 + 117
    for item in all_.values():
        reps = item.reps
        assert len(reps) == 2 * item.count
        for s, e in zip(reps[::2], reps[1::2]):
            assert s < e, item.video_name
        ends = reps[1::2]
        assert ends == sorted(ends), item.video_name


def test_eval_count_analytic_oracle_on_real_counts(helper):
    # reference tests/test_repcount_dataset.py:66-85: perturb every gt
    # count by ±1 ⇒ eval_count returns exactly the analytic MAE and OBO=1
    import random
    rng = random.Random(0)
    for sp in SPLITS:
        data = helper.get_rep_data([sp], ["squat"])
        preds, true_mae = {}, 0.0
        for name, item in data.items():
            d = rng.choice([-1, 1])
            preds[name] = item.count + d
            if item.count > 0:
                true_mae += 1.0 / item.count
        true_mae /= len(preds)
        mae, obo, _ = helper.eval_count(preds, [sp], ["squat"])
        assert mae == pytest.approx(true_mae, abs=1e-12)
        assert obo == 1.0
