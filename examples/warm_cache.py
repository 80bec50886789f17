"""Warm-then-verify the XLA persistent compile cache before driver handoff.

Round-1/2 failure mode this automates away (r2 verdict weak #7): kernels
edited AFTER the cache was warmed -> driver cache miss -> cold Mosaic/XLA
compile inside the bench budget -> watchdog result. This script:

  1. runs `python bench.py` once (the WARM pass — every phase compiles and
     its executable lands in .jax_cache/);
  2. with --prune, STASHES every existing entry first so the warm pass
     rebuilds the exact working set from scratch, then deletes the stash
     (access times are unreliable under relatime, so "was this entry read"
     cannot be observed — rebuild-from-empty is the only sound prune);
  3. runs `python bench.py` again (the VERIFY pass) and FAILS if it took
     longer than --verify-budget seconds (a cold compile of any serving
     phase costs minutes; a fully warm run takes ~2 min incl. device time);
  4. FAILS if any compute-path source file is newer than the warm pass
     (i.e. someone edited code after warming);
  5. writes .jax_cache/MANIFEST.json tying the entries to the source state.

Usage:  python examples/warm_cache.py [--verify-budget 240] [--skip-warm]
Then:   git add .jax_cache && commit — and do not touch compute-path code.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".jax_cache")
# directories whose edits invalidate compiled programs
SOURCE_DIRS = ["qwen3_tts_tpu/nn", "qwen3_tts_tpu/ops", "qwen3_tts_tpu/models",
               "qwen3_tts_tpu/parallel"]
SOURCE_FILES = ["bench.py"]


def newest_source_mtime() -> tuple[float, str]:
    newest, which = 0.0, ""
    for d in SOURCE_DIRS:
        for dirpath, _, files in os.walk(os.path.join(ROOT, d)):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    m = os.path.getmtime(p)
                    if m > newest:
                        newest, which = m, os.path.relpath(p, ROOT)
    for f in SOURCE_FILES:
        m = os.path.getmtime(os.path.join(ROOT, f))
        if m > newest:
            newest, which = m, f
    return newest, which


def run_bench(tag: str, budget: int) -> tuple[float, str]:
    env = dict(os.environ, BENCH_BUDGET_S=str(budget))
    t0 = time.time()
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, cwd=ROOT, env=env,
                         timeout=budget + 120)
    dt = time.time() - t0
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    print(f"[{tag}] {dt:.0f}s  {line[:160]}", flush=True)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        sys.exit(f"{tag} bench run failed rc={out.returncode}")
    if '"value": 0.0' in line:
        sys.exit(f"{tag} bench emitted a zero headline — investigate before handoff")
    return dt, line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-budget", type=int, default=240,
                    help="max seconds for the verify (fully-warm) pass")
    ap.add_argument("--warm-budget", type=int, default=3000)
    ap.add_argument("--skip-warm", action="store_true",
                    help="only verify (cache assumed already warm)")
    ap.add_argument("--prune", action="store_true",
                    help="rebuild the cache from empty (exact bench set)")
    args = ap.parse_args()

    os.makedirs(CACHE, exist_ok=True)
    if not args.skip_warm:
        if args.prune:
            stash = os.path.join(CACHE, "_stash")
            os.makedirs(stash, exist_ok=True)
            n = 0
            for f in os.listdir(CACHE):
                p = os.path.join(CACHE, f)
                # markers record which kernel phases are warm; stashing
                # them would silently drop those phases from the warm pass
                if (os.path.isfile(p) and f != "MANIFEST.json"
                        and not f.startswith("STEP_KERNEL_WARM")):
                    os.rename(p, os.path.join(stash, f))
                    n += 1
            print(f"stashed {n} entries; warm pass rebuilds from empty",
                  flush=True)
        run_bench("warm", args.warm_budget)
        if args.prune:
            import shutil

            shutil.rmtree(stash)
            print("stash deleted (cache now holds exactly the bench set)",
                  flush=True)

    verify_start = time.time()
    dt, line = run_bench("verify", max(args.verify_budget, 60))
    if dt > args.verify_budget:
        sys.exit(f"verify pass took {dt:.0f}s > {args.verify_budget}s budget: "
                 "some phase cold-compiled — the cache is NOT warm. Re-run "
                 "without --skip-warm and do not edit compute-path code after.")

    src_mtime, src_file = newest_source_mtime()
    if src_mtime > verify_start:
        sys.exit(f"{src_file} changed during/after the verify pass — re-warm.")

    entries = sorted(f for f in os.listdir(CACHE)
                     if os.path.isfile(os.path.join(CACHE, f))
                     and f != "MANIFEST.json")
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, cwd=ROOT).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"],
                           capture_output=True, text=True, cwd=ROOT).stdout
    manifest = {
        "verified_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "tree_dirty": bool(dirty.strip()),
        "verify_wall_s": round(dt, 1),
        "newest_source": {"file": src_file,
                          "mtime": time.strftime(
                              "%Y-%m-%dT%H:%M:%SZ", time.gmtime(src_mtime))},
        "result_line": line,
        "n_entries": len(entries),
        "entries": entries,
    }
    with open(os.path.join(CACHE, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"cache verified warm: {len(entries)} entries, verify {dt:.0f}s "
          f"(budget {args.verify_budget}s). MANIFEST.json written.", flush=True)


if __name__ == "__main__":
    main()
