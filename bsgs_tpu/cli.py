"""Command-line solver: TPU-native equivalent of the reference binary.

Flag surface mirrors the reference CLI (README.md:2-16, getprogparam
1_9_7File.pb:875-1042) with TPU-appropriate geometry knobs:

  reference              here
  ---------              ----
  -pb <pubkey>           --pub / -pb
  -pk / -pke <hex>       --pk / --pke (hex range bounds)
  -w  <exp|count>        --w   (exponent <= 64, else decimal count)
  -htsz <bits>           --htsz
  -t -b -p (batch geo)   --n-offsets (N per job), --jobs-per-epoch (T)
  -d 1,2,3               --devices (count of mesh chips)
  -infile <file>         --infile (one pubkey per line, lazy)
  -wl <file>             --resume <file>
  -wt <sec>              --checkpoint-interval
  -sf 0/1 (RAM/file HT)  --positions mirror/rescan (host-RAM-decoupled
                         hit lookup for big-w streamed tables)
  (win.txt)              --win-file
  (Tune printout)        --tune

Found keys append to the win file and print to stdout; checkpoints are
written atomically and refuse to resume across geometry changes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Persistent XLA compile cache: kernel compiles cost minutes per fresh
# process without it (see utils/compile_cache for why env vars alone
# don't enable it under the TPU transport's early-jax-import hook).
from .utils import compile_cache

compile_cache.enable()


def rate_exponent(rate: float, w: int) -> int:
    """floor(log2(effective keys/s)) for the progress line: rate
    giant-steps/s covers rate * 2w keys/s; bit_length() alone overstates
    by one (2^57.3 keys/s must print ~2^57, the reference's display
    anchor, 1_9_7File.pb:5131-5135)."""
    return max(0, int(rate * 2 * w).bit_length() - 1)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bsgs-tpu",
        description="TPU-native secp256k1 BSGS range solver",
    )
    p.add_argument("--pub", "-pb", help="pubkey hex (02/03/04 or 128-hex)")
    p.add_argument("--pk", default="1", help="range start (hex)")
    p.add_argument("--pke", default=None, help="range end (hex)")
    p.add_argument("--w", default="20", help="baby table size: exponent "
                   "(<=64, fractional ok) or decimal count")
    p.add_argument("--htsz", type=int, default=None,
                   help="hash bucket bits (default: auto for the window)")
    p.add_argument("--n-offsets", type=int, default=None,
                   help="giant offsets per job (default: tuned)")
    p.add_argument("--jobs-per-epoch", type=int, default=8)
    p.add_argument("--window", type=int, default=None,
                   help="dense bucket row width (default: 128, one lane "
                   "tile — the TPU hot layout)")
    p.add_argument("--n-split", type=int, default=8,
                   help="independent probe gather streams per epoch")
    p.add_argument("--pipeline", type=int, default=3,
                   help="epochs in flight before a host sync")
    p.add_argument("--verify-defer-epochs", type=int, default=64,
                   help="drains to pool before batch-verifying hits on "
                   "rescan tables (checkpoints trail verification; "
                   "0 = verify every drain)")
    p.add_argument("--devices", type=int, default=None,
                   help="number of chips to use (default: all)")
    p.add_argument("--device-ids", "-d", default=None,
                   help="comma-separated chip indices to use (reference "
                   "-d 1,2,3 device selection); overrides --devices")
    p.add_argument("--shard-table", action="store_true",
                   help="shard the baby table across chips (large-w mode)")
    p.add_argument("--positions", "-sf", default="auto",
                   choices=["auto", "mirror", "rescan"],
                   help="hit-position lookup for streamed big-w builds: "
                   "mirror = host position matrix (8 B/key host RAM), "
                   "rescan = regenerate on device per hit (host RAM "
                   "independent of w; the reference's -sf file mode)")
    p.add_argument("--infile", help="file with one pubkey per line")
    p.add_argument("--resume", "-wl", help="checkpoint file to resume")
    p.add_argument("--checkpoint-file", default="currentwork.json")
    p.add_argument("--checkpoint-interval", "-wt", type=float, default=180.0)
    p.add_argument("--win-file", default="win.txt")
    p.add_argument("--cache-dir", default=".bsgs_cache",
                   help="directory for reusable table artifacts")
    p.add_argument("--tune", action="store_true",
                   help="print suggested geometry for this device and exit")
    p.add_argument("--gen-only", action="store_true",
                   help="build+verify table artifacts, then exit (the "
                   "reference's onlygen precompute tool)")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .utils import codecs, checkpoint as ckpt, tuner
    from .models import solver as smod
    from .utils import artifacts, ecpy

    if args.tune:
        import jax

        for i, d in enumerate(jax.devices()):
            print(f"device {i}: {d}")
        # size w against the ACTUAL search range when given (the
        # reference's Tune consumes the -pk/-pke range the same way,
        # 1_9_7File.pb:324-431): a 2^30-range search caps w near 2^15,
        # not at the HBM limit
        range_bits = None
        if args.pke is not None:
            pk = codecs.parse_scalar(args.pk)
            pke = codecs.parse_scalar(args.pke)
            if pke > pk:
                range_bits = (pke - pk).bit_length()
        print(tuner.tune(range_bits=range_bits).report())
        return 0

    from .models import table as tbl

    if args.gen_only:
        import jax

        w = codecs.parse_w(args.w)
        window = args.window or tbl.DEVICE_WINDOW
        htsz = args.htsz if args.htsz is not None else tbl.pick_htsz(w, window)
        if not args.quiet:
            print(f"generating artifacts: w={w} htsz={htsz} "
                  f"-> {args.cache_dir}")
        path = artifacts.baby_table_path(args.cache_dir, w, htsz, window)
        if jax.default_backend() == "tpu":
            # TPU-accelerated generation (reference onlygen1_9_6File.pb is
            # CPU-only; here the table builds on-chip and only the packed
            # arrays come back for the artifact)
            cfg = smod.SolverConfig(w=w, htsz=htsz, window=window,
                                    positions=args.positions)
            baby = smod.build_table(cfg)
            artifacts.save_baby_table(baby, path)
            # round-trip + random-oracle verify the artifact we just wrote
            baby = artifacts.load_baby_table(path)
        elif os.path.exists(path):
            baby = artifacts.load_baby_table(path, window=window)
        else:
            baby = artifacts.get_baby_table(
                w, htsz, window=window, cache_dir=args.cache_dir
            )
        if not args.quiet:
            print(tbl.table_stats(baby))
        print("finished ok")
        return 0

    if not args.pub and not args.infile:
        print("need --pub or --infile (or --tune)", file=sys.stderr)
        return 2

    pk = codecs.parse_scalar(args.pk)
    if args.pke is None:
        print("need --pke (range end, hex)", file=sys.stderr)
        return 2
    pke = codecs.parse_scalar(args.pke)
    if pke <= pk:
        print("--pke must be > --pk", file=sys.stderr)
        return 2

    w = codecs.parse_w(args.w)
    window = args.window or tbl.DEVICE_WINDOW
    htsz = args.htsz if args.htsz is not None else tbl.pick_htsz(w, window)
    n_offsets = args.n_offsets or min(1 << 18, max(256, w // 4))
    device_ids = None
    if args.device_ids:
        device_ids = [int(x) for x in args.device_ids.split(",") if x != ""]
        n_devices = len(device_ids)
    else:
        n_devices = args.devices or 0

    cfg = smod.SolverConfig(
        w=w, htsz=htsz, n_offsets=n_offsets,
        jobs_per_epoch=args.jobs_per_epoch, window=window,
        n_split=args.n_split, pipeline=args.pipeline,
        positions=args.positions,
        verify_defer_epochs=args.verify_defer_epochs,
    )
    fingerprint = ckpt.config_fingerprint(
        w=w, htsz=htsz, n_offsets=n_offsets, pk=pk, pke=pke,
        jobs_per_epoch=args.jobs_per_epoch,
        devices=n_devices, shard_table=bool(args.shard_table),
    )

    def iter_pubs():
        """Lazy pubkey stream: CLI pubkey first, then --infile one line at
        a time (the reference's readNextPubFile, 1_9_7File.pb:4370 — the
        file is never loaded whole)."""
        if args.pub:
            yield args.pub
        if args.infile:
            with open(args.infile) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield line

    start_index, start_epoch = 0, 0
    if args.resume:
        try:
            ck = ckpt.Checkpoint.load(args.resume, fingerprint)
        except (ValueError, OSError, KeyError) as e:
            print(f"cannot resume: {e}", file=sys.stderr)
            return 2
        start_index, start_epoch = ck.pub_index, ck.next_epoch
        if not args.quiet:
            print(f"resuming at pubkey #{start_index}, epoch {start_epoch}")
    elif os.path.exists(args.win_file):
        # fresh (non-recovery) start clears the win file, like the
        # reference (1_9_7File.pb:4959-4963)
        os.unlink(args.win_file)

    import jax

    if not args.quiet:
        # device report, the reference's startup GPU scan
        # (retGPUcount, 1_9_7File.pb:766-862)
        for i, d in enumerate(jax.devices()):
            mark = ""
            if device_ids is not None:
                mark = "  [selected]" if i in device_ids else ""
            print(f"device {i}: {d}{mark}")
        print(f"building baby table: w={w} htsz={htsz} ...")

    # device_ids always routes through the mesh path, even for one chip:
    # a plain Solver would ignore the selection and run on the default
    # device (mesh(1 chip) measures within ~9% of single-chip, PROFILE_r04)
    use_mesh = n_devices > 1 or args.shard_table or device_ids is not None
    m = None
    if use_mesh:
        from .parallel import mesh as pmesh, striped
        m = pmesh.make_mesh(n_devices or None, device_ids=device_ids)

    if args.shard_table and m is not None and m.devices.size > 1:
        # bucket-range sharded build DIRECTLY on the mesh: each chip
        # scatters its own row slice, so the table may exceed one chip's
        # HBM (the guard in build_table sizes against the PER-CHIP slice)
        baby = smod.build_table(cfg, mesh=m)
    elif jax.default_backend() == "tpu":
        # on-device pack: regeneration beats any transfer on TPU
        baby = smod.build_table(cfg)
    else:
        baby = artifacts.get_baby_table(
            w, htsz, window=window, cache_dir=args.cache_dir
        )
    if not args.quiet:
        print(tbl.table_stats(baby))
    s = smod.Solver(cfg, baby=baby)

    n_chips = 1
    if use_mesh:
        # MeshSolver shares Solver's loop: resume/checkpoint/progress all
        # work identically on the mesh path
        s = striped.MeshSolver(s, m, shard_baby_table=args.shard_table)
        n_chips = s.n_chips

    writer = ckpt.CheckpointWriter(
        args.checkpoint_file, fingerprint, args.checkpoint_interval
    )
    found = 0
    seen = 0
    t_start = time.time()
    for idx, pub_hex in enumerate(iter_pubs()):
        if idx < start_index:
            continue
        seen += 1
        try:
            pub = codecs.parse_pubkey(pub_hex)
        except codecs.PubkeyError as e:
            print(f"skipping pubkey #{idx}: {e}", file=sys.stderr)
            continue

        def on_epoch(epoch, steps, _idx=idx, _hex=pub_hex):
            writer.maybe_write(_idx, _hex, epoch + 1, steps)

        def progress(done, total, steps, dt, _w=w):
            # rate display with the reference's semantics
            # (1_9_7File.pb:5119-5142): per-chip and total giant-steps/s,
            # x2w effective keys/s exponent
            if args.quiet or dt <= 0:
                return
            rate = steps / dt
            per_chip = (f"{rate / n_chips / 1e6:.2f}x{n_chips} "
                        if n_chips > 1 else "")
            print(
                f"\r  epoch {done}/{total}  "
                f"{per_chip}{rate / 1e6:.2f} Mgsteps/s  "
                f"(~2^{rate_exponent(rate, _w)} keys/s)",
                end="", flush=True,
            )

        if not args.quiet:
            rate_note = f" [#{idx + 1}]" if args.infile else ""
            print(f"searching{rate_note} {pub_hex[:24]}... "
                  f"range [{pk:#x}, {pke:#x}]")
        res = s.solve(
            pub, pk, pke,
            start_epoch=start_epoch if idx == start_index else 0,
            on_epoch=on_epoch,
            progress=progress,
        )
        if not args.quiet:
            print()
        if res.key is not None:
            found += 1
            line = f"{res.key:064x} {codecs.format_pubkey(pub)}"
            with open(args.win_file, "a") as f:
                f.write(line + "\n")
            print(f"KEY FOUND: {res.key:#x}")
        elif not args.quiet:
            print(f"exhausted range for pubkey #{idx} "
                  f"({res.giant_steps} giant steps, {res.elapsed_s:.1f}s)")
        writer.maybe_write(idx + 1, "", 0, 0, force=True)
    if not args.quiet:
        dt = time.time() - t_start
        print(f"done: {found}/{seen} keys in {dt:.1f}s")
    return 0


def _main_with_crashlog(argv=None) -> int:
    """Crash-handler wrapper: dump the traceback to a timestamped error log
    (reference ErrorHandler, 1_9_7File.pb:4299-4367) and re-raise."""
    try:
        return main(argv)
    except KeyboardInterrupt:
        print("\ninterrupted", file=sys.stderr)
        return 130
    except Exception:
        import datetime
        import traceback

        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        path = f"{stamp}_error_log.txt"
        try:
            with open(path, "w") as f:
                f.write(" ".join(sys.argv) + "\n\n")
                traceback.print_exc(file=f)
            print(f"fatal error — details in {path}", file=sys.stderr)
        except OSError:
            pass
        raise


if __name__ == "__main__":
    raise SystemExit(_main_with_crashlog())
