"""Entry point: `python -m kmerdb_tpu <mode> [options] <args>`.

Mirrors the reference CLI contract (src/main.cpp:22-62): dispatch on
mode, usage text on errors, exit code -1 on failure.
"""

import sys

from . import consoles
from .params import MODES, UsageError, parse_args

_RUNNERS = {
    "build": consoles.run_build,
    "minhash": consoles.run_minhash,
    "all2all": consoles.run_all2all,
    "all2all-sp": consoles.run_all2all_sp,
    "new2all": consoles.run_new2all,
    "one2all": consoles.run_one2all,
    "distance": consoles.run_distance,
}


def _usage(mode=None):
    print("USAGE\n    kmer-db-tpu <mode> [options] <positional arguments>\n",
          file=sys.stderr)
    print("Modes: " + ", ".join(MODES), file=sys.stderr)
    print("Run `kmer-db-tpu <mode> -help` for mode-specific options "
          "(option surface matches kmer-db 2.x).", file=sys.stderr)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    try:
        params = parse_args(argv)
        if params is None:
            return 0
        if params.mode == "all2all-parts":
            from .parts import run_all2all_parts
            run_all2all_parts(params)
        else:
            _RUNNERS[params.mode](params)
        return 0
    except UsageError as e:
        _usage(e.mode)
        return -1 & 0xFF
    except Exception as e:  # noqa: BLE001 — CLI boundary (main.cpp:51-59)
        print(str(e), file=sys.stderr)
        return -1 & 0xFF


if __name__ == "__main__":
    sys.exit(main())
