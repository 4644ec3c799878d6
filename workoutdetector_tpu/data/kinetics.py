"""Kinetics-400 annotation layer.

Consumes the Kinetics CSV packs the reference ships
(datasets/kinetics400/: kinetics_400_labels.csv `id,name`; split CSVs
`label,youtube_id,time_start,time_end,split`) and converts them to this
framework's 3-col rawframe lists for FrameDataset — the k400
pretrain/eval data story behind configs/kinetics400_tsm.yaml.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional

from workoutdetector_tpu.settings import PROJ_ROOT


def load_labels(labels_csv: Optional[str] = None) -> Dict[str, int]:
    """{class name: id} from kinetics_400_labels.csv."""
    import pandas as pd
    path = labels_csv or osp.join(PROJ_ROOT, "datasets", "kinetics400",
                                  "kinetics_400_labels.csv")
    df = pd.read_csv(path)
    return {str(row["name"]): int(row["id"]) for _, row in df.iterrows()}


def split_to_rawframe_list(split_csv: str,
                           rawframes_root: str,
                           out_txt: str,
                           labels_csv: Optional[str] = None,
                           filename_tmpl: str = "img_{:05}.jpg") -> int:
    """Kinetics split CSV → 3-col rawframe list `dir total_frames label`.

    Only videos whose rawframe dir exists are emitted (partial local
    copies of k400 are the norm). Returns lines written.
    """
    import pandas as pd
    labels = load_labels(labels_csv)
    df = pd.read_csv(split_csv)
    n = 0
    os.makedirs(osp.dirname(osp.abspath(out_txt)), exist_ok=True)
    with open(out_txt, "w") as f:
        for _, row in df.iterrows():
            name = str(row["label"])
            if name not in labels:
                continue
            ytb = row["youtube_id"]
            start = int(row["time_start"])
            # mmaction-style dir naming: {ytb}_{start:06}_{end:06}
            stem = f"{ytb}_{start:06}_{int(row['time_end']):06}"
            frame_dir = osp.join(rawframes_root, stem)
            if not osp.isdir(frame_dir):
                frame_dir = osp.join(rawframes_root, ytb)  # plain-id layout
                if not osp.isdir(frame_dir):
                    continue
            total = len([x for x in os.listdir(frame_dir)
                         if x.endswith((".jpg", ".jpeg", ".png"))])
            if total == 0:
                continue
            rel = osp.relpath(frame_dir, rawframes_root)
            f.write(f"{rel} {total} {labels[name]}\n")
            n += 1
    return n
