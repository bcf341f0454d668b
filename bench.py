"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...raw data}.

Measures end-to-end PE preprocessing throughput (reads/sec/chip) on a
synthetic 150bp PE corpus with the full default pipeline plus correction and
sliding-window cutting (BASELINE config 3 flavor), explicit adapters for
both programs.  vs_baseline compares against reference fastp with 16 worker
threads measured on this host (tools/bench_baseline.json caches the number
if the reference binary is unavailable at bench time).

Protocol: the reference runs cold each time (its startup is trivial).
fastp_tpu runs in its deployment mode — a resident server process
(`fastp_tpu serve`) started once per host: the first (warmup) job pays the
accelerator's one-time costs (PJRT init + XLA compile + TPU program load,
the latter tens of seconds of server-side variance); timed jobs then run at
steady state through the millisecond-startup thin client, exactly as a
production pipeline feeding many FASTQ files would.  Raw per-run seconds
for BOTH sides plus the warmup cost are emitted so the protocol and any
baseline drift are auditable.
"""
import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = "/tmp/fastp_bench"
N_PAIRS = int(os.environ.get("BENCH_PAIRS", "2000000"))
REF_BIN = "/tmp/refbuild/fastp"
BASELINE_CACHE = os.path.join(ROOT, "tools", "bench_baseline.json")
SOCK = os.path.join(BENCH_DIR, "serve.sock")

FLAGS = ["--correction", "--cut_right",
         "-a", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
         "--adapter_sequence_r2", "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"]
ARGS = ["-i", os.path.join(BENCH_DIR, "R1.fq"),
        "-I", os.path.join(BENCH_DIR, "R2.fq"),
        "-o", "out1.fq", "-O", "out2.fq"] + FLAGS

REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


CORPUS_VERSION = "v2-nova4"  # bump when make_synth output changes


def ensure_corpus():
    r1 = os.path.join(BENCH_DIR, "R1.fq")
    vfile = os.path.join(BENCH_DIR, "corpus_version")
    ver_ok = (os.path.exists(vfile)
              and open(vfile).read().strip() == CORPUS_VERSION)
    # ~330 bytes/record: require the file to match the requested N_PAIRS
    if not (ver_ok and os.path.exists(r1)
            and N_PAIRS * 250 < os.path.getsize(r1) < N_PAIRS * 450):
        os.makedirs(BENCH_DIR, exist_ok=True)
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "make_synth.py"),
                        "--reads", str(N_PAIRS),
                        "--out1", r1, "--out2", os.path.join(BENCH_DIR, "R2.fq")],
                       check=True)
        with open(vfile, "w") as f:
            f.write(CORPUS_VERSION)
    w1 = os.path.join(BENCH_DIR, "warm_R1.fq")
    if not (ver_ok and os.path.exists(w1)):
        # small same-shape corpus for the server's pre-READY warm run
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "make_synth.py"),
                        "--reads", "65536", "--seed", "7",
                        "--out1", w1,
                        "--out2", os.path.join(BENCH_DIR, "warm_R2.fq")],
                       check=True)


def measure_reference():
    """fastp -w 16 on this host. Returns (best_reads_per_sec, raw_seconds)."""
    runs = []
    if os.path.exists(REF_BIN):
        workdir = os.path.join(BENCH_DIR, "ref_run")
        os.makedirs(workdir, exist_ok=True)
        for _ in range(max(2, REPEATS - 1)):
            t0 = time.time()
            subprocess.run([REF_BIN] + ARGS + ["-w", "16"], cwd=workdir,
                           check=True, capture_output=True, timeout=3600)
            runs.append(time.time() - t0)
        best = 2 * N_PAIRS / min(runs)
        if N_PAIRS < 1000000:
            return best, runs  # don't pollute the cache with small-corpus runs
        try:
            prev = None
            if os.path.exists(BASELINE_CACHE):
                with open(BASELINE_CACHE) as f:
                    prev = json.load(f).get("fastp_w16_reads_per_sec")
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"fastp_w16_reads_per_sec": best, "pairs": N_PAIRS,
                           "host_cores": os.cpu_count(),
                           "previous_value": prev,
                           "raw_seconds": [round(r, 2) for r in runs]}, f)
        except OSError:
            pass
        return best, runs
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["fastp_w16_reads_per_sec"], []
    return 0.0, []


def _client_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["FASTP_TPU_SERVER"] = SOCK
    # glibc (2.34+) MADV_HUGEPAGEs malloc arenas: on virtualized hosts with
    # slow 4KB faults (30-65us measured) this cuts first-touch cost ~28x.
    # Tunables are only read at process start, so set it for the children.
    if "glibc.malloc.hugetlb" not in env.get("GLIBC_TUNABLES", ""):
        env["GLIBC_TUNABLES"] = (env.get("GLIBC_TUNABLES", "")
                                 + (":" if env.get("GLIBC_TUNABLES") else "")
                                 + "glibc.malloc.hugetlb=1")
    return env


def _start_server(env):
    try:
        os.unlink(SOCK)
    except OSError:
        pass
    warm_dir = os.path.join(BENCH_DIR, "warm_run")
    os.makedirs(warm_dir, exist_ok=True)
    warm_argv = ["fastp_tpu",
                 "-i", os.path.join(BENCH_DIR, "warm_R1.fq"),
                 "-I", os.path.join(BENCH_DIR, "warm_R2.fq"),
                 "-o", os.path.join(warm_dir, "w1.fq"),
                 "-O", os.path.join(warm_dir, "w2.fq"),
                 "-j", os.path.join(warm_dir, "w.json"),
                 "-h", os.path.join(warm_dir, "w.html")] + FLAGS + [
                 "--batch_size", "32768"]
    serve_err = open(os.path.join(BENCH_DIR, "serve.err"), "w")
    senv = dict(env)
    senv["FASTP_TPU_TIMING"] = "1"  # per-run stage splits land in serve.err
    proc = subprocess.Popen(
        [sys.executable, "-m", "fastp_tpu", "serve", "--socket", SOCK,
         "--warm", "--warm-run", json.dumps(warm_argv)],
        env=senv, cwd=BENCH_DIR, stdout=subprocess.PIPE,
        stderr=serve_err, text=True)
    # the warm run absorbs the TPU program-load lottery (100s-22min
    # observed, plus a cold XLA compile when the persistent cache misses).
    # readline() blocks, so a watchdog kills the server at the deadline
    # (readline then returns at EOF) — without it a silently-hung backend
    # init (tunnel down: the axon claim loop emits nothing) wedges the
    # whole bench forever.
    import threading
    deadline = time.time() + 3600
    watchdog = threading.Timer(3600, proc.send_signal, (signal.SIGKILL,))
    watchdog.daemon = True
    watchdog.start()
    try:
        while time.time() < deadline:
            line = proc.stdout.readline()
            if line.startswith("READY"):
                return proc
            if proc.poll() is not None or not line:
                return None
    finally:
        watchdog.cancel()
    proc.send_signal(signal.SIGKILL)
    return None


def _stop_server(proc, env):
    subprocess.run([sys.executable, "-c",
                    "from fastp_tpu.client import shutdown_server;"
                    "shutdown_server(%r)" % SOCK],
                   env=env, timeout=60)
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.send_signal(signal.SIGKILL)  # exact PID we started


def _ensure_gz_corpus():
    """One-time gzip copies of the corpus (gzipped INPUT bench variant)."""
    paths = []
    for name in ("R1.fq", "R2.fq"):
        src = os.path.join(BENCH_DIR, name)
        dst = src + ".gz"
        if not (os.path.exists(dst)
                and os.path.getmtime(dst) >= os.path.getmtime(src)):
            with open(dst, "wb") as f:
                subprocess.run(["gzip", "-4", "-c", src], stdout=f,
                               check=True, timeout=1800)
        paths.append(dst)
    return paths


def measure_ours():
    """Returns (raw_run_seconds, warmup_seconds, gz_run_seconds).

    The server pre-warms (compile + TPU program load) before READY via a
    small same-shape --warm-run job, so every timed run is steady-state.
    After the plain-text runs, the same server times gzipped-input runs
    (the native libdeflate inflate path) — real-world FASTQ is .gz, so the
    codec must hold the plain-text rate (VERDICT r2: within 15%).
    """
    workdir = os.path.join(BENCH_DIR, "tpu_run")
    os.makedirs(workdir, exist_ok=True)
    env = _client_env()
    # one fixed batch shape per server: the TPU server caches ~one loaded
    # executable, so alternating shapes would force reloads.  32k batches
    # measured best on the tunnel (fewer, larger transfers).
    cmd = [sys.executable, "-m", "fastp_tpu"] + ARGS + ["--batch_size", "32768"]

    t_start = time.time()
    server = _start_server(env)
    if server is None:
        # server died during warmup (tunnel/PJRT flake): surface the
        # evidence and retry once before degrading to cold runs
        try:
            with open(os.path.join(BENCH_DIR, "serve.err")) as f:
                sys.stderr.write("bench: server died during warmup:\n"
                                 + f.read()[-4000:] + "\n")
        except OSError:
            pass
        server = _start_server(env)
    warmup = time.time() - t_start if server is not None else None
    runs = []
    gz_runs = []
    try:
        for k in range(REPEATS):
            t0 = time.time()
            try:
                r = subprocess.run(cmd, cwd=workdir, env=env, check=True,
                                   capture_output=True, timeout=7200)
                with open(os.path.join(BENCH_DIR, "run%d.err" % k), "wb") as f:
                    f.write(r.stderr)  # keeps FASTP_TPU_TIMING stage splits
            except subprocess.SubprocessError as e:
                sys.stderr.write("bench: run %d failed (%s)\n" % (k, e))
                continue
            runs.append(time.time() - t0)
        if runs and server is not None:
            try:
                gz1, gz2 = _ensure_gz_corpus()
                gz_dir = os.path.join(BENCH_DIR, "gz_run")
                os.makedirs(gz_dir, exist_ok=True)
                gz_cmd = [sys.executable, "-m", "fastp_tpu",
                          "-i", gz1, "-I", gz2,
                          "-o", "out1.fq", "-O", "out2.fq"] + FLAGS + [
                          "--batch_size", "32768"]
                for k in range(2):
                    t0 = time.time()
                    subprocess.run(gz_cmd, cwd=gz_dir, env=env, check=True,
                                   capture_output=True, timeout=7200)
                    gz_runs.append(time.time() - t0)
            except subprocess.SubprocessError as e:
                sys.stderr.write("bench: gz variant failed (%s)\n" % (e,))
    finally:
        if server is not None:
            _stop_server(server, env)
    if not runs:  # server path yielded nothing: cold per-process fallback
        for _ in range(REPEATS):
            t0 = time.time()
            try:
                subprocess.run(cmd, cwd=workdir,
                               env=dict(env, FASTP_TPU_SERVER=""),
                               check=True, capture_output=True, timeout=7200)
            except subprocess.SubprocessError as e:
                sys.stderr.write("bench: cold run failed (%s)\n" % (e,))
                continue
            runs.append(time.time() - t0)
    return runs, warmup, gz_runs


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return (xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0)


def measure_devices(n_devices: int, pairs: int, backend: str):
    """Multi-chip scaling harness: run the pipeline over an n-device
    jax.sharding mesh (--devices) and over 1 device, emit reads/s and
    scaling efficiency.  With backend=cpu this exercises the sharded
    path on a virtual host-device mesh (all virtual devices share the
    host's cores, so efficiency is a correctness/coverage signal, not a
    hardware number); on a real multi-chip host run with backend=tpu."""
    dev_dir = os.path.join(BENCH_DIR, "dev%d" % pairs)
    r1 = os.path.join(dev_dir, "R1.fq")
    if not os.path.exists(r1):
        os.makedirs(dev_dir, exist_ok=True)
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "make_synth.py"),
                        "--reads", str(pairs),
                        "--out1", r1, "--out2", os.path.join(dev_dir, "R2.fq")],
                       check=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d "
                            % n_devices + env.get("XLA_FLAGS", ""))
    results = {}
    for nd in (1, n_devices):
        workdir = os.path.join(dev_dir, "run%d" % nd)
        os.makedirs(workdir, exist_ok=True)
        cmd = [sys.executable, "-m", "fastp_tpu",
               "-i", r1, "-I", os.path.join(dev_dir, "R2.fq"),
               "-o", "out1.fq", "-O", "out2.fq"] + FLAGS + [
               "--devices", str(nd), "--batch_size", "8192"]
        best = None
        for _ in range(2):  # second run reuses the compile cache
            t0 = time.time()
            subprocess.run(cmd, cwd=workdir, env=env, check=True,
                           capture_output=True, timeout=7200)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[nd] = 2 * pairs / best
    eff = results[n_devices] / (results[1] * n_devices)
    print(json.dumps({
        "metric": "pe150_mesh_reads_per_sec",
        "value": round(results[n_devices], 1),
        "unit": "reads/s",
        "vs_baseline": None,
        "devices": n_devices,
        "backend": backend,
        "pairs": pairs,
        "reads_per_sec_1dev": round(results[1], 1),
        "scaling_efficiency": round(eff, 3),
        "protocol": "jax.sharding dp mesh via --devices; best of 2 "
                    "cold-process runs per point (virtual CPU devices "
                    "share host cores; efficiency is meaningful on real "
                    "multi-chip hardware)",
    }))


def main():
    if "--devices" in sys.argv:
        import argparse
        ap = argparse.ArgumentParser()
        ap.add_argument("--devices", type=int, required=True)
        ap.add_argument("--pairs", type=int,
                        default=int(os.environ.get("BENCH_MESH_PAIRS", "100000")))
        ap.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
        a = ap.parse_args()
        measure_devices(a.devices, a.pairs, a.backend)
        return
    ensure_corpus()
    baseline, ref_runs = measure_reference()
    runs, warmup, gz_runs = measure_ours()
    # headline = MEDIAN of >=3 runs (best-of would convert tunnel-bandwidth
    # luck into reported throughput); min/max ride along for auditability
    ours = 2 * N_PAIRS / _median(runs) if runs else 0.0
    best = 2 * N_PAIRS / min(runs) if runs else 0.0
    print(json.dumps({
        "metric": "pe150_full_pipeline_reads_per_sec_per_chip",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / baseline, 4) if baseline else None,
        "pairs": N_PAIRS,
        "runs_seconds": [round(r, 2) for r in runs],
        "best_reads_per_sec": round(best, 1),
        "server_warmup_seconds": round(warmup, 2) if warmup else None,
        "ref_runs_seconds": [round(r, 2) for r in ref_runs],
        "gz_input_runs_seconds": [round(r, 2) for r in gz_runs],
        "gz_vs_plain": (round(_median(runs) / min(gz_runs), 3)
                        if gz_runs and runs else None),
        "baseline_reads_per_sec": round(baseline, 1),
        "protocol": "median of %d steady-state runs through a resident "
                    "pre-warmed server (fastp_tpu serve --warm-run); "
                    "reference cold-started per run (its startup is "
                    "trivial); reference number is its best run"
                    % max(len(runs), 1),
    }))


if __name__ == "__main__":
    main()
