"""The one-command protocol reproduction (tools/repro.py, VERDICT r4 #4)
is bit-stable: two runs with identical arguments produce identical
accuracy tables, and the README block rewrite is idempotent."""

import json
import os.path as osp
import sys

import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

import repro


@pytest.fixture(scope="module")
def two_runs(tmp_path_factory):
    args = ["--cpu", "--no-readme", "--videos", "10", "--steps", "30",
            "--image-size", "32", "--corpus-size", "48"]
    r1 = repro.main(args + ["--out", str(tmp_path_factory.mktemp("r1"))])
    r2 = repro.main(args + ["--out", str(tmp_path_factory.mktemp("r2"))])
    return r1, r2


def test_repro_bit_stable(two_runs):
    r1, r2 = two_runs
    assert r1["synthetic"] == r2["synthetic"]
    assert r1["train"] == r2["train"]
    # the protocol really ran: all three families over the test split
    assert set(r1["synthetic"]) == {"video", "motion", "similarity"}
    for fam in r1["synthetic"].values():
        assert fam["n"] >= 4


def test_repro_score_artifacts(two_runs):
    r1, _ = two_runs
    out = r1["out_dir"]
    scores = osp.join(out, "scores")
    import os
    files = [f for f in os.listdir(scores) if f.endswith(".score.json")]
    assert len(files) == r1["synthetic"]["video"]["n"]
    assert osp.isfile(osp.join(out, "eval_video.csv"))
    # trained classifier genuinely learned the synthetic states (the
    # reduced 30-step test config underfits vs the 80-step default —
    # bit-stability above is the real gate here)
    assert r1["train"]["final_train_acc"] >= 0.7


def test_readme_update_idempotent(tmp_path):
    md = tmp_path / "README.md"
    md.write_text("# header\n\nbody\n")
    table = "\n".join([repro.MARK_BEGIN, "| a | b |", repro.MARK_END])
    repro.update_readme(table, str(md))
    once = md.read_text()
    assert once.count(repro.MARK_BEGIN) == 1 and "| a | b |" in once
    # replacing with a new table swaps the block, never appends
    table2 = "\n".join([repro.MARK_BEGIN, "| c | d |", repro.MARK_END])
    repro.update_readme(table2, str(md))
    twice = md.read_text()
    assert twice.count(repro.MARK_BEGIN) == 1
    assert "| c | d |" in twice and "| a | b |" not in twice
    assert twice.startswith("# header")
