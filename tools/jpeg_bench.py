"""Host rawframe-decode benchmark: native libjpeg batch vs cv2+host path.

The training input pipeline's host cost is dominated by JPEG decode
(reference hot loop: workoutdetector/datasets/common.py:99-117 reads
num_segments files per item). This times three ways of producing a
(T, 224, 224, 3) test-transform clip from 720p JPEG frames:

  cv2+host     cv2.imread → cvtColor → resize_short(256) → center_crop(224)
  native-full  libjpeg full decode (RGB out) → host transform
  native-batch one wdj_decode_batch_prepped call (DCT prescale + resize +
               crop on a C++ thread pool)

Usage: python tools/jpeg_bench.py [--frames 64] [--clip 8] [--size 720]
"""

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--size", type=int, default=720, help="short side of source")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import cv2

    from workoutdetector_tpu.data import jpeg as njpeg
    from workoutdetector_tpu.data.transforms import TestTransform

    if not njpeg.native_available():
        raise SystemExit("libwdjpeg.so not built (cd native && make)")

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    h, w = args.size, args.size * 16 // 9
    img = rng.integers(0, 256, size=(h // 8, w // 8, 3), dtype=np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    paths = []
    for i in range(args.frames):
        p = osp.join(d, f"img_{i:05}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)

    tt = TestTransform(size=224, scale=256)

    def cv2_host(batch):
        frames = [cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                               cv2.COLOR_BGR2RGB) for p in batch]
        return tt(np.stack(frames), None)

    def native_full(batch):
        return tt(np.stack([njpeg.read_image(p) for p in batch]), None)

    def native_batch(batch):
        return njpeg.read_batch_prepped(batch, 256, 224)

    results = {}
    for name, fn in [("cv2+host", cv2_host), ("native-full", native_full),
                     ("native-batch", native_batch)]:
        fn(paths[:args.clip])  # warm page cache / pools
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.reps):
            for i in range(0, args.frames - args.clip + 1, args.clip):
                out = fn(paths[i:i + args.clip])
                assert out.shape[-3:] == (224, 224, 3)
                n += args.clip
        dt = time.perf_counter() - t0
        results[name] = n / dt
        print(f"{name:13s} {n / dt:8.1f} frames/s "
              f"({dt / (n / args.clip) * 1000:6.1f} ms/clip of {args.clip})")
    print(f"native-batch speedup vs cv2+host: "
          f"{results['native-batch'] / results['cv2+host']:.2f}x "
          f"(threads={os.cpu_count()})")


if __name__ == "__main__":
    main()
