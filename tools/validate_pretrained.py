"""One-command trained-weight validation runbook (VERDICT r2 item 10).

The moment the published checkpoints are reachable (network, or copied in),
this runs the whole BASELINE.md protocol unattended:

  python tools/validate_pretrained.py                      # fetch from HF hub
  python tools/validate_pretrained.py --pretrained_dir D   # use local files

Steps:
  1. fetch ``wmencodec.th`` + ``English.pth`` (+ ``Mandarin.pth`` unless
     --skip_zh) via ``models.pretrained.fetch_checkpoint`` (HF hub / URL /
     local dir), integrity-checked against ``KNOWN_SHA256`` when recorded;
  2. ``--record_sha``: print + write the SHA256s into a sidecar JSON so
     ``KNOWN_SHA256`` can be filled in (first verified fetch);
  3. run ``tools/capture_goldens.py`` — captures reference-torch goldens for
     the 5 BASELINE.md configs AND asserts JAX-converted-weight parity;
  4. run the gated replay tests (``tests/test_pretrained.py``) which consume
     the captured artifacts without torch.

Exit code 0 = every config parity-OK and the gated tests pass.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssr_speech_tpu.models import pretrained  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--pretrained_dir", default=None,
                   help="local dir with the .pth/.th files; default: HF hub")
    p.add_argument("--out", default="tests/goldens/pretrained")
    p.add_argument("--skip_zh", action="store_true")
    p.add_argument("--record_sha", action="store_true",
                   help="write sha256 sidecar for KNOWN_SHA256 bootstrap")
    args = p.parse_args(argv)

    # 1. fetch --------------------------------------------------------------
    stage = os.path.join(pretrained._cache_dir(), "validate_stage")
    os.makedirs(stage, exist_ok=True)
    paths = {}
    want = [("wmencodec.th", pretrained.DEFAULT_REPO),
            ("English.pth", pretrained.DEFAULT_REPO)]
    if not args.skip_zh:
        want.append(("Mandarin.pth", pretrained.MANDARIN_REPO))
    for fname, repo in want:
        src = args.pretrained_dir if args.pretrained_dir else repo
        try:
            paths[fname] = pretrained.fetch_checkpoint(src, filename=fname)
        except Exception as e:
            if fname == "Mandarin.pth":
                print(f"[validate] Mandarin.pth unavailable ({e}); skipping zh")
                continue
            sys.exit(f"[validate] cannot fetch {fname} from {src}: {e}")

    # capture_goldens expects one dir with the canonical filenames
    for fname, path in paths.items():
        dest = os.path.join(stage, fname)
        if os.path.abspath(path) != os.path.abspath(dest):
            shutil.copyfile(path, dest)

    # 2. record hashes ------------------------------------------------------
    shas = {f: pretrained.file_sha256(p) for f, p in paths.items()}
    print(json.dumps({"sha256": shas}, indent=2))
    if args.record_sha:
        with open(os.path.join(stage, "sha256.json"), "w") as f:
            json.dump(shas, f, indent=2)
        print(f"[validate] recorded hashes in {stage}/sha256.json — copy into "
              "ssr_speech_tpu/models/pretrained.py::KNOWN_SHA256")

    # 3. capture goldens + torch-vs-jax parity ------------------------------
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "capture_goldens.py"),
           "--pretrained_dir", stage, "--out", args.out]
    if "Mandarin.pth" not in paths or args.skip_zh:
        cmd.append("--skip_zh")
    rc = subprocess.call(cmd)
    if rc != 0:
        sys.exit(rc)

    # 4. gated replay tests -------------------------------------------------
    env = dict(os.environ, SSR_PRETRAINED_DIR=stage)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_pretrained.py", "-q"],
        env=env, cwd=os.path.dirname(here))
    sys.exit(rc)


if __name__ == "__main__":
    main()
