"""Run several repo tools sequentially in ONE Python process.

Why: the axon TPU relay charges EVERY new client a startup stall (measured
~5–17 min in degraded modes, CLAUDE.md), and serializes clients — so
N separate tool invocations pay the tax N times and must never overlap.
This runner imports the tools and calls their `main(argv)` in-process:
one client, one stall, strict serialization by construction.

Spec file: JSON list of stages
    [{"tool": "tsdf_smoke", "argv": ["--dims", "256"],
      "stdout": "/tmp/tsdf.json"}, ...]
`tool` is a module name importable from tools/ (it must expose
`main(argv=None) -> int`; a tool whose main() takes no argv — e.g.
ablate_tally_cmp — is called bare when "argv" is absent/null).
Each stage's stdout is captured to its `stdout` path (stderr passes
through for live progress). A stage that raises or returns nonzero is
reported and does NOT stop later stages — long queues survive one
flaky stage. Exit code = number of failed stages.

Usage: python tools/tpu_queue.py queue.json
"""

from __future__ import annotations

import contextlib
import importlib
import io
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def run_queue(stages: list[dict]) -> int:
    failures = 0
    for i, st in enumerate(stages):
        name = st["tool"]
        argv = st.get("argv")
        out_path = st.get("stdout")
        t0 = time.time()
        print(f"[queue] stage {i + 1}/{len(stages)}: {name} "
              f"argv={argv}", file=sys.stderr, flush=True)
        buf = io.StringIO()
        try:
            mod = importlib.import_module(name)
            with contextlib.redirect_stdout(buf):
                rc = (mod.main(argv) if argv is not None
                      else mod.main())
        except SystemExit as e:       # argparse --help / sys.exit paths
            rc = int(e.code or 0)
        except Exception:
            traceback.print_exc()
            rc = -1
        if out_path:
            Path(out_path).write_text(buf.getvalue())
        if rc != 0:
            failures += 1
        print(f"[queue] stage {name}: rc={rc} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    return failures


def main(argv=None) -> int:
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 1:
        print(__doc__, file=sys.stderr)
        return 2
    return run_queue(json.loads(Path(args[0]).read_text()))


if __name__ == "__main__":
    sys.exit(main())
