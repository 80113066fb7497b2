"""Command-line entry point.

Reference CLI: ``julia HAKAI_j.jl <file.inp>`` (HAKAI_j.jl:3729-3735).
Here: ``python -m hakai_tpu <file.inp> [options]``.
"""
from __future__ import annotations

import argparse
import os


def _resolve_energy_flags(energy_check: bool, energy_abort: float | None):
    """Energy-guard CLI resolution (VERDICT r4 #8 — default-on):

    * default: check on, abort at 0.1 of the energy scale (conservative —
      the documented N2k f32 blow-up crosses it thousands of steps before
      NaN; healthy f64/mixed runs sit orders of magnitude below);
    * --energy-abort REL implies the check (any REL, including 0 =
      report-only);
    * --no-energy-check alone turns both off.
    """
    if energy_abort is not None:
        return (True if energy_abort > 0 else energy_check,
                energy_abort if (energy_check or energy_abort > 0) else 0.0)
    return energy_check, (0.1 if energy_check else 0.0)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="hakai_tpu",
        description="TPU-native dynamic-explicit FEM solver (.inp in, VTK out)")
    ap.add_argument("inp", help="Abaqus .inp input deck")
    ap.add_argument("--precision", choices=["f32", "f64", "mixed"],
                    default="f64",
                    help="f64 matches the reference; mixed = f64 nodal "
                         "kinematics + f32 element/contact math (fast and "
                         "stable for long contact runs)")
    ap.add_argument("--out-dir", default="temp", help="VTK output directory")
    ap.add_argument("--output-num", type=int, default=100,
                    help="number of VTK frames (reference: 100)")
    ap.add_argument("--no-output", action="store_true",
                    help="skip VTK writing (benchmarking)")
    ap.add_argument("--kc", type=float, default=1.0,
                    help="contact penalty scale (reference kc)")
    ap.add_argument("--myu", type=float, default=0.25,
                    help="contact friction coefficient")
    ap.add_argument("--node-pad", type=int, default=8)
    ap.add_argument("--elem-pad", type=int, default=8)
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save a resumable checkpoint every N frames")
    ap.add_argument("--resume", default=None,
                    help="checkpoint file to resume from")
    ap.add_argument("--metrics", default=None,
                    help="write per-chunk JSONL diagnostics to this path")
    ap.add_argument("--check-nan", action="store_true",
                    help="abort when displacements go non-finite")
    ap.add_argument("--energy-check", action="store_true", default=True,
                    help="accumulate the discrete energy balance (external/"
                         "constraint work vs kinetic + internal work); the "
                         "residual is exact in real arithmetic, so its "
                         "growth detects roundoff-energy injection "
                         "(precision instability) thousands of steps "
                         "before NaN.  ON by default for CLI runs "
                         "(costs two (3,N) dot-reductions per step); "
                         "reported in --metrics records")
    ap.add_argument("--no-energy-check", dest="energy_check",
                    action="store_false",
                    help="disable the energy-balance guard (pure-throughput "
                         "runs; the solver then has no early-warning for "
                         "precision instability)")
    ap.add_argument("--energy-abort", type=float, default=None,
                    metavar="REL",
                    help="abort when the energy residual exceeds REL of the "
                         "run's energy scale (default 0.1 — conservative: "
                         "the documented f32 crash-deck blow-up crosses it "
                         "thousands of steps before NaN while healthy f64/"
                         "mixed runs stay orders of magnitude below); "
                         "0 = report in metrics only, never abort")
    ap.add_argument("--compile-cache",
                    default=os.environ.get("HAKAI_COMPILE_CACHE",
                                           "~/.cache/hakai_tpu/xla"),
                    help="persistent XLA compilation cache directory "
                         "(second runs of a deck shape skip the multi-"
                         "minute compile); pass 'off' to disable")
    ap.add_argument("--devices", type=int, default=None,
                    help="element-shard the run over this many devices "
                         "(jax.sharding.Mesh; frames match a "
                         "single-device run: structure byte-identical, "
                         "float fields to ~1e-6 relative / last printed "
                         "digit)")
    ap.add_argument("--chunk-unroll", type=int, default=0,
                    help="unroll factor for the chunk step loop on small "
                         "(<=32k-element) decks; 0 (default) = no unroll "
                         "(measured a net loss on TPU; see docs/PERF.md); "
                         "explicit values are applied unguarded and can "
                         "trade bitwise-exact checkpoint resume for "
                         "throughput")
    ap.add_argument("--halo", type=int, default=None,
                    help="node-sharded halo-exchange decomposition over "
                         "this many devices (pod-scale path: halo rows "
                         "plus the compact contact-node block ride the "
                         "interconnect)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the whole run "
                         "into this directory (open with TensorBoard / "
                         "xprof)")
    ap.add_argument("--multihost", default=None, metavar="SPEC",
                    help="initialize jax.distributed for a multi-host run "
                         "(every host runs the same command; --halo spans "
                         "the GLOBAL device count).  'auto' on TPU pods "
                         "(coordinator discovered from the TPU metadata); "
                         "'ADDR:PORT,NPROC,PID' elsewhere.  Frames/metrics"
                         "/checkpoints are written by process 0 only")
    ap.add_argument("--element-kernel", default="auto",
                    choices=["auto", "xla", "pallas", "pallas_mxu"],
                    help="element-math backend: auto (default) = the "
                         "MXU-assisted packed Pallas kernel when eligible "
                         "(TPU, f32/mixed, tile-divisible E — wins both "
                         "the VMEM-resident and HBM-spill regimes), else "
                         "fused XLA; xla = force fused XLA; pallas_mxu = "
                         "require the MXU kernel; pallas = the VPU-only "
                         "packed kernel (loses to XLA; comparison only)")
    ap.add_argument("--mxu-precision", default="highest",
                    choices=["highest", "high"],
                    help="f32 matmul passes inside the MXU element kernel: "
                         "highest (default) = 6-pass bf16 (f32-exact "
                         "products); high = 3-pass bf16x3 (~12%% faster "
                         "step at 1M elements; adds ~1e-6 relative error "
                         "per dot, measured two orders below f32's own "
                         "trajectory drift vs f64)")
    args = ap.parse_args(argv)
    args.energy_check, args.energy_abort = _resolve_energy_flags(
        args.energy_check, args.energy_abort)

    if args.multihost:
        # must run before anything initializes a backend
        import jax
        if args.multihost == "auto":
            jax.distributed.initialize()
        else:
            addr, nproc, pid = args.multihost.rsplit(",", 2)
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=int(nproc),
                                       process_id=int(pid))

    elem_pad = args.elem_pad
    if args.element_kernel in ("pallas", "pallas_mxu"):
        if args.precision == "f64":
            ap.error(f"--element-kernel {args.element_kernel} requires "
                     "--precision f32 or mixed (TPU custom calls cannot "
                     "take f64; the kernel would silently never engage)")
        elem_pad = max(elem_pad, 1024)   # kernel tile divisibility

    from .config import ContactConfig, SolverConfig
    cfg = SolverConfig(
        dtype={"f64": "float64", "f32": "float32",
               "mixed": "mixed"}[args.precision],
        out_dir=args.out_dir,
        output_num=args.output_num,
        node_pad=(args.node_pad if not args.halo
                  else max(args.node_pad, 8) * args.halo),
        # per-shard plans need Es = E/devices to be a multiple of 16 (the
        # assembly plan's source 8*Es must be a multiple of 128); elem_pad=8
        # would silently drop the whole multi-chip path to the 3-5x-slower
        # XLA-gather fallback
        elem_pad=(elem_pad if not args.devices
                  else max(elem_pad, 16) * args.devices),
        element_kernel=args.element_kernel,
        mxu_precision=args.mxu_precision,
        contact=ContactConfig(kc=args.kc, kc_self=args.kc, myu=args.myu),
        renumber=("always" if args.halo else "auto"),
        metrics_path=args.metrics,
        checkpoint_every=args.checkpoint_every,
        check_nan=args.check_nan,
        energy_check=args.energy_check,
        energy_abort_rel=args.energy_abort,
        chunk_unroll=args.chunk_unroll,
    )
    if cfg.dtype in ("float64", "mixed"):
        import jax
        jax.config.update("jax_enable_x64", True)
    if args.compile_cache and args.compile_cache != "off":
        import jax
        cache_dir = os.path.expanduser(args.compile_cache)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from .io.inp import read_inp_file
    from .core.lowering import lower
    from .core.state import init_state
    from .solver.explicit import run
    from .utils.checkpoint import load_checkpoint, save_checkpoint

    model_in = read_inp_file(args.inp)
    print(f"nNode:{model_in.n_node}")
    print(f"nElement:{model_in.n_element}")
    print(f"contact_flag:{model_in.contact_flag}")
    print(f"mass_scaling:{model_in.mass_scaling}")
    model = lower(model_in, cfg)
    print(f"time_num:{model.time_num}")
    print(f"elementMinSize:{model.element_min_size}")
    print(f"elementMaxSize:{model.element_max_size}")
    if model.dt > model.cfl_dt:
        print(f"WARNING: dt={model.dt:.3e} exceeds CFL estimate "
              f"{model.cfl_dt:.3e} — expect instability")
    if (args.precision == "f64" and model.pairs
            and not model.fracture_enabled):
        # default-experience hint: the crash decks (contact, fracture-free)
        # are where f64 costs the most; mixed was validated on them
        # (KE trajectory matches f64 to ~4 digits through 48k steps,
        # docs/PERF.md) at ~5.8x the speed
        print("hint: this contact deck runs full f64 (reference-matching "
              "default).  --precision mixed (f64 kinematics + f32 element/"
              "contact math) is validated on the crash decks and ~5.8x "
              "faster; the energy-balance guard (on by default) monitors "
              "precision health either way")

    state = init_state(model)
    resume_halo = None
    if args.resume:
        from .parallel.halo import is_halo_checkpoint
        if is_halo_checkpoint(args.resume):
            if not args.halo or args.halo < 2:
                raise SystemExit(f"{args.resume} is a shard-major halo "
                                 "checkpoint; pass the matching --halo N")
            resume_halo = args.resume     # loaded inside run() post-partition
            print("resuming from halo checkpoint")
        else:
            state = load_checkpoint(args.resume, state)
            print(f"resumed at step {int(state.t)}")
    want = max(args.devices or 0, args.halo or 0)
    if want > 1:
        import jax
        n_vis = len(jax.devices())
        if n_vis < want:
            raise SystemExit(f"{want} devices requested but only "
                             f"{n_vis} visible")
    from .utils.profiling import trace
    with trace(args.profile):
        state = run(model, state, write_output=not args.no_output,
                    devices=args.devices, halo=args.halo,
                    resume_halo=resume_halo)
    if args.checkpoint_every:
        import jax
        if jax.process_index() == 0:
            save_checkpoint(f"{args.out_dir}/final.ckpt.npz", state)
    return state


if __name__ == "__main__":
    main()
