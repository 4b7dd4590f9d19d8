"""UWA/Mian occlusion benchmark analysis.

Equivalent of the reference's analyze_mian.py (pcl/alignment/analyze_mian.py:
1-195): parse the UWA occlusion.txt ground-truth metadata and one or two
directories of alignment run logs, compute match success at
(0.3·model_diameter, 12°), and report error-vs-occlusion statistics
(plots if matplotlib is available, stats always).

Log format consumed: the objective_slam_tpu CLI logfiles, which carry the
same 'Transformations for <model> in <scene>' and
'Distance (trans, rot): <t>, <r>' lines as the reference logs.

Usage:
  python tools/analyze_uwa.py occlusion.txt run_dir_a [run_dir_b] [--plot out]
"""

from __future__ import annotations

import argparse
import math
import os
import re
import sys

import numpy as np

# Fixed model diameters of the UWA models (analyze_mian.py:42-47).
MODEL_DIAMS = {
    "chef": 136.59418,
    "trex": 98.828925,
    "para": 131.250275,
    "chicken": 86.28052,
}
TWELVE_DEG = 0.209440   # radians (analyze_mian.py:49)

_ALIASES = {"cheff": "chef", "t-rex": "trex", "parasaurolophus": "para"}


def read_occlusion_txt(path):
    """Rows: [scene_num, model, occlusion%] (analyze_mian.py:9-17)."""
    rows = []
    with open(path) as f:
        for line in f.readlines()[1:]:
            parts = [p.strip() for p in line.split()]
            if len(parts) >= 3:
                rows.append([parts[0], parts[1], float(parts[2])])
    return rows


def _canon_model(name: str) -> str:
    base = os.path.basename(name).split("_")[0].split(".")[0].lower()
    return _ALIASES.get(base, base)


def read_run_dir(data, path):
    """Attach per-(scene, model) [trans_err, rot_err] from run logs
    (analyze_mian.py:19-40). Log file names must start with 'rs<scene>_'."""
    for name in sorted(os.listdir(path)):
        m = re.match(r"rs(\d+)[_.]", name)
        if not m:
            continue
        scene_num = m.group(1)
        cur_model = None
        with open(os.path.join(path, name)) as f:
            for line in f:
                tm = re.search(r"Transformations for (\S+) in", line)
                if tm:
                    cur_model = _canon_model(tm.group(1))
                if "Distance (trans, rot):" in line and cur_model:
                    nums = re.findall(r"[-+0-9.eE]+",
                                      line.split("Distance (trans, rot):")[1])
                    dist = [float(nums[0]), float(nums[1])]
                    for row in data:
                        if row[0] == scene_num and row[1] == cur_model:
                            row.append(dist)
    return data


def analyze(data, dist_thresh_factor=0.3, rot_thresh=TWELVE_DEG):
    """Compute per-row match + normalized errors (analyze_mian.py:51-72)."""
    rows = [r for r in data if len(r) > 3]
    occl, nd, rot, match = [], [], [], []
    for r in rows:
        diam = MODEL_DIAMS.get(r[1])
        if diam is None:
            continue
        te, re_ = r[3]
        re_w = re_ if re_ <= math.pi else 2 * math.pi - re_
        occl.append(r[2])
        nd.append(te / diam)
        rot.append(re_w)
        match.append(te <= dist_thresh_factor * diam and re_ <= rot_thresh)
    return (np.asarray(occl), np.asarray(nd), np.asarray(rot),
            np.asarray(match))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("occlusion_txt")
    p.add_argument("run_dirs", nargs="+")
    p.add_argument("--plot", type=str, default=None,
                   help="basename for output plots (requires matplotlib)")
    p.add_argument("--diam", action="append", default=[],
                   help="extra/override model diameter as name=value "
                        "(repeatable) for non-UWA datasets")
    args = p.parse_args(argv)
    for d in args.diam:
        name, val = d.split("=")
        MODEL_DIAMS[name.strip()] = float(val)

    runs = []
    for d in args.run_dirs:
        data = read_occlusion_txt(args.occlusion_txt)
        read_run_dir(data, d)
        runs.append((d, *analyze(data)))

    for name, occl, nd, rot, match in runs:
        if len(nd) == 0:
            print(f"{name}: no parsed results")
            continue
        print(f"== {name}: {len(nd)} results ==")
        print(f"  match rate (0.3*diam, 12deg): {match.mean():.3f}")
        print(f"  trans err/diam  mean {nd.mean():.4f}  median "
              f"{np.median(nd):.4f}")
        print(f"  rot err (rad)   mean {rot.mean():.4f}  median "
              f"{np.median(rot):.4f}")

    if args.plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping plots", file=sys.stderr)
            return 0
        styles = ["ro", "bo", "go"]
        for metric, idx, title, ylabel in [
                ("trans", 2, "Translation Error",
                 "Distance in Multiples of Model Diameter"),
                ("rot", 3, "Rotation Error", "Distance in Radians")]:
            plt.figure(figsize=(10, 7))
            for si, (name, occl, nd, rot, match) in enumerate(runs):
                y = (nd, rot)[idx - 2]
                if len(y) == 0:
                    continue
                style = styles[si % len(styles)]
                plt.plot(occl, y, style, markersize=4,
                         label=os.path.basename(name))
                plt.plot(occl, [np.mean(y)] * len(occl), style[0] + "-",
                         label=f"{os.path.basename(name)} Mean")
                plt.plot(occl, [np.median(y)] * len(occl), style[0] + "--",
                         label=f"{os.path.basename(name)} Median")
            plt.legend(loc="upper left")
            plt.title(title)
            plt.xlabel("Percent Occlusion")
            plt.ylabel(ylabel)
            plt.savefig(f"{args.plot}_{metric}.png", dpi=120)
            print(f"wrote {args.plot}_{metric}.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
