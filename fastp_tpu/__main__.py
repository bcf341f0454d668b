import os
import sys

# `fastp_tpu serve --socket ...`: resident server mode (see server.py)
if len(sys.argv) >= 2 and sys.argv[1] == "serve":
    from .server import serve_main
    sys.exit(serve_main(sys.argv[2:]))

# When FASTP_TPU_SERVER names a live server socket, route the job there via
# the thin client (no JAX import: millisecond startup, warm executables).
# STDIN-streaming jobs stay local; on any client failure fall back to local.
_srv = os.environ.get("FASTP_TPU_SERVER")
if (_srv and os.path.exists(_srv) and "--stdin" not in sys.argv
        and "/dev/stdin" not in sys.argv):
    from .client import run_via_server
    _rc = run_via_server(_srv, sys.argv)
    if _rc is not None:
        sys.exit(_rc)

from .cli import main

sys.exit(main())
