"""Profile the 4-process multiprocess worker: stream RESULT lines with
wall-clock timestamps to find where the 400s goes on a 4-core box."""
import os
import socket
import subprocess
import sys
import threading
import time

def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]

def main(nprocs=4):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/multiprocess_worker.py", str(i), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd="/root/repo",
        )
        for i in range(nprocs)
    ]
    def pump(i, p):
        for line in p.stdout:
            print(f"[{time.time()-t0:7.1f}s p{i}] {line.rstrip()}", flush=True)
    threads = [threading.Thread(target=pump, args=(i, p)) for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    rcs = [p.wait() for p in procs]
    for t in threads:
        t.join()
    print(f"DONE {time.time()-t0:.1f}s rcs={rcs}")

if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
