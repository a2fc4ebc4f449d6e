"""CLI entry — mirrors the reference executable (main.cpp:41-89):

    python -m panovlm_tpu <stage> <config.txt>

stages: init_camera_pose | init_lidar_pose | joint_optimization |
        colorize_lidar_map | joint_mvs

pair surgery (patch a persisted pair set without recomputing the stage):

    python -m panovlm_tpu add_pair <config.txt> <i> <j>
    python -m panovlm_tpu recompute_pairs <config.txt> <idx1> <idx2>
    python -m panovlm_tpu set_straight_motion <config.txt> <start> <end> <len>
    python -m panovlm_tpu dump_relative_poses <config.txt> [out.txt]
    python -m panovlm_tpu dump_global_poses <config.txt> [out.txt]
"""

from __future__ import annotations

import logging
import sys

from .config import load_config
from .pipeline import STAGES
from .utils.timing import TimeReport


def _enable_compile_cache():
    """Persistent XLA compile cache, shared with bench/tests: stage
    processes are short-lived (one stage per process, like the reference's
    one-executable-run-per-stage contract) so without this every run
    re-pays multi-minute tunnel compiles for programs compiled in the
    previous stage/run."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    surgery = {"add_pair", "recompute_pairs"}
    if len(argv) == 4 and argv[0] in surgery:
        logging.basicConfig(level=logging.INFO,
                            format="%(asctime)s %(levelname)s %(message)s")
        _enable_compile_cache()
        from . import pair_surgery
        getattr(pair_surgery, argv[0])(load_config(argv[1]),
                                       int(argv[2]), int(argv[3]))
        return 0
    if len(argv) == 5 and argv[0] == "set_straight_motion":
        logging.basicConfig(level=logging.INFO,
                            format="%(asctime)s %(levelname)s %(message)s")
        _enable_compile_cache()
        from . import pair_surgery
        pair_surgery.set_straight_motion(load_config(argv[1]), int(argv[2]),
                                         int(argv[3]), int(argv[4]))
        return 0
    if argv and argv[0] in ("dump_relative_poses", "dump_global_poses") \
            and len(argv) in (2, 3):
        logging.basicConfig(level=logging.INFO,
                            format="%(asctime)s %(levelname)s %(message)s")
        from . import pair_surgery
        getattr(pair_surgery, argv[0])(load_config(argv[1]),
                                       argv[2] if len(argv) == 3 else None)
        return 0
    if len(argv) != 2 or argv[0] not in STAGES:
        print(__doc__)
        return 2
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    _enable_compile_cache()
    # Multi-host (DCN) runs: JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID env triplet fans the per-frame stages out across
    # hosts (parallel/multihost.py); single-process runs are unaffected.
    from .parallel.multihost import initialize_distributed
    initialize_distributed()
    stage, config_path = argv
    cfg = load_config(config_path)
    tr = TimeReport()
    with tr.phase(stage):
        STAGES[stage](cfg, tr)
    print(tr.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
