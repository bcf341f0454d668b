"""Thin client for the resident server (see server.py).

Never imports JAX or numpy: client startup is milliseconds, so short jobs
pay none of the accelerator's one-time costs.  Used automatically by
`python -m fastp_tpu ...` when FASTP_TPU_SERVER names a live socket.
"""
from __future__ import annotations

import json
import os
import socket
import struct
import sys


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    parts = []
    while n:
        b = conn.recv(n)
        if not b:
            raise ConnectionError("server closed")
        parts.append(b)
        n -= len(b)
    return b"".join(parts)


def run_via_server(sock_path: str, argv):
    """Run `argv` on the resident server. Returns the job's exit code, or
    None if the server is unreachable (caller should fall back to local)."""
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        conn.connect(sock_path)
    except OSError:
        return None
    try:
        # job-level knobs (shard index/count from the --local_processes
        # launcher, timing/debug toggles) ride the request so the resident
        # server applies them for this job only
        jobenv = {k: v for k, v in os.environ.items()
                  if k.startswith("FASTP_TPU_") and k != "FASTP_TPU_SERVER"}
        req = json.dumps({"op": "run", "argv": list(argv),
                          "cwd": os.getcwd(), "env": jobenv}) + "\n"
        conn.sendall(req.encode())
        out = getattr(sys.stdout, "buffer", sys.stdout)
        err = getattr(sys.stderr, "buffer", sys.stderr)
        while True:
            tag = _recv_exact(conn, 1)
            (n,) = struct.unpack("<I", _recv_exact(conn, 4))
            payload = _recv_exact(conn, n) if n else b""
            if tag == b"O":
                out.write(payload)
                out.flush()
            elif tag == b"E":
                err.write(payload)
                err.flush()
            elif tag == b"R":
                return json.loads(payload)["rc"]
    except (OSError, ConnectionError):
        return None
    finally:
        conn.close()


def shutdown_server(sock_path: str) -> bool:
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        conn.connect(sock_path)
        conn.sendall((json.dumps({"op": "shutdown"}) + "\n").encode())
        _recv_exact(conn, 5)
        return True
    except OSError:
        return False
    finally:
        conn.close()
