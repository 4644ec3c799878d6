"""Dataset pre-flight validator tests (scripts/validate_dataset.py).

The reference's lazy loaders turn a single missing/corrupt frame into a
worker crash mid-epoch; the validator promotes that to an explicit
pre-flight check. These tests build healthy and deliberately-broken
fixtures and assert each defect class is caught with the right severity.
"""

import os
import os.path as osp

import numpy as np
import pandas as pd
import pytest

from workoutdetector_tpu.scripts.validate_dataset import (Issue, main,
                                                          validate_rawframe_list,
                                                          validate_repcount,
                                                          validate_videos)

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def rawframe_root(tmp_path):
    for vi in range(3):
        d = tmp_path / "rawframes" / f"v{vi}"
        d.mkdir(parents=True)
        for i in range(1, 9):
            cv2.imwrite(str(d / f"img_{i:05}.jpg"),
                        np.full((24, 32, 3), 17 * vi, np.uint8))
    anno = tmp_path / "train.txt"
    anno.write_text("".join(f"v{k} 1 8 {k % 2}\n" for k in range(3)))
    return tmp_path, str(anno)


def _errors(issues):
    return [i for i in issues if i.severity == "error"]


def test_healthy_rawframe_list(rawframe_root):
    root, anno = rawframe_root
    issues = validate_rawframe_list(anno, str(root), "rawframes",
                                    num_class=2, probe="full")
    assert issues == []


def test_missing_frame_caught(rawframe_root):
    root, anno = rawframe_root
    os.remove(str(root / "rawframes" / "v1" / "img_00005.jpg"))
    issues = validate_rawframe_list(anno, str(root), "rawframes")
    assert any("missing" in i.message and "v1" in i.path
               for i in _errors(issues))


def test_missing_dir_and_bad_label(rawframe_root):
    root, anno = rawframe_root
    with open(anno, "a") as f:
        f.write("ghost 1 8 1\n")   # no such dir
        f.write("v0 1 8 9\n")      # label out of range
    issues = validate_rawframe_list(anno, str(root), "rawframes", num_class=2)
    msgs = [i.message for i in _errors(issues)]
    assert any("directory missing" in m for m in msgs)
    assert any("label 9" in m for m in msgs)


def test_corrupt_jpeg_probed(rawframe_root):
    root, anno = rawframe_root
    victim = root / "rawframes" / "v2" / "img_00008.jpg"
    victim.write_bytes(b"\xff\xd8\xff\xe0" + os.urandom(32))
    # last frame is in the 'sample' probe set
    issues = validate_rawframe_list(anno, str(root), "rawframes",
                                    probe="sample")
    assert any("img_00008" in i.path for i in _errors(issues))
    # probe='none' skips content checks
    assert validate_rawframe_list(anno, str(root), "rawframes",
                                  probe="none") == []


def test_nonpositive_total_frames(tmp_path):
    anno = tmp_path / "bad.txt"
    anno.write_text("v0 1 0 0\n")
    issues = validate_rawframe_list(str(anno), str(tmp_path))
    assert any("total_frames" in i.message for i in _errors(issues))


@pytest.fixture()
def repcount_root(tmp_path):
    rows = []
    for i, (count, reps) in enumerate([(2, "3 10 12 20"), (1, "5 9")]):
        rows.append({"name": f"vid{i}.mp4", "class_": "squat",
                     "split": "train", "count": count, "reps": reps,
                     "vid": f"y{i}", "start": 0, "end": 30})
    pd.DataFrame(rows).to_csv(tmp_path / "annotation.csv")
    # give each row a rawframe dir so media exists
    for i in range(2):
        d = tmp_path / "rawframes" / "train" / f"vid{i}"
        d.mkdir(parents=True)
        for k in range(1, 25):
            cv2.imwrite(str(d / f"img_{k:05}.jpg"),
                        np.zeros((8, 8, 3), np.uint8))
    return tmp_path


def test_repcount_healthy(repcount_root):
    assert validate_repcount(str(repcount_root)) == []


def test_repcount_defects(repcount_root):
    df = pd.read_csv(repcount_root / "annotation.csv", index_col=0)
    extra = pd.DataFrame([
        # count mismatch (says 3, has 2 pairs)
        {"name": "badcount.mp4", "class_": "squat", "split": "train",
         "count": 3, "reps": "3 10 12 20", "vid": "y", "start": 0, "end": 1},
        # end < start
        {"name": "badorder.mp4", "class_": "squat", "split": "train",
         "count": 1, "reps": "9 5", "vid": "y", "start": 0, "end": 1},
        # cross-pair violation: rep 2 starts before rep 1 ends
        {"name": "overlap.mp4", "class_": "squat", "split": "train",
         "count": 2, "reps": "3 10 5 20", "vid": "y", "start": 0, "end": 1},
        # media missing entirely
        {"name": "nomedia.mp4", "class_": "squat", "split": "train",
         "count": 1, "reps": "1 2", "vid": "y", "start": 0, "end": 1},
        # boundary way beyond total_frames (24 on disk) → warning
        {"name": "farbound.mp4", "class_": "squat", "split": "val",
         "count": 1, "reps": "1 500", "vid": "y", "start": 0, "end": 1},
    ])
    pd.concat([df, extra], ignore_index=True).to_csv(
        repcount_root / "annotation.csv")
    # every defect row except nomedia gets media so only its own defect fires
    for split, name in (("train", "badcount"), ("train", "badorder"),
                        ("train", "overlap"), ("val", "farbound")):
        d = repcount_root / "rawframes" / split / name
        d.mkdir(parents=True)
        for k in range(1, 25):
            cv2.imwrite(str(d / f"img_{k:05}.jpg"), np.zeros((8, 8, 3), np.uint8))
    issues = validate_repcount(str(repcount_root))
    msgs = [i.message for i in issues]
    assert any("!= " in m and "rep pairs" in m for m in msgs)
    assert any("rep end 5 precedes boundary 9" in m for m in msgs)
    assert any("next rep start 5 precedes boundary 10" in m for m in msgs)
    assert any("neither video file nor rawframe dir" in m for m in msgs)
    warn = [i for i in issues if i.severity == "warning"]
    assert any("beyond total_frames" in i.message for i in warn)


def test_validate_videos(tmp_path):
    from workoutdetector_tpu.data.video import write_video
    frames = np.zeros((12, 32, 32, 3), np.uint8)
    write_video(str(tmp_path / "ok.mp4"), frames, fps=12)
    (tmp_path / "broken.mp4").write_bytes(b"not a container")
    issues = validate_videos(str(tmp_path))
    errs = _errors(issues)
    assert len(errs) == 1 and "broken.mp4" in errs[0].path
    empty = tmp_path / "empty"
    empty.mkdir()
    assert validate_videos(str(empty))[0].severity == "warning"


def test_cli_exit_codes(rawframe_root, capsys):
    root, anno = rawframe_root
    rc = main(["--rawframe-list", anno, "--data-root", str(root),
               "--data-prefix", "rawframes", "--num-class", "2"])
    assert rc == 0
    assert "0 error(s)" in capsys.readouterr().out
    os.remove(str(root / "rawframes" / "v0" / "img_00001.jpg"))
    rc = main(["--rawframe-list", anno, "--data-root", str(root),
               "--data-prefix", "rawframes"])
    assert rc == 1
