"""Server load generator: concurrent requests, reports latency/RTF/throughput.

Usage: python examples/load_test_server.py http://127.0.0.1:8000 [n_requests] [concurrency]
"""

import json
import sys
import threading
import time
import urllib.request


def main(base: str, n: int = 16, conc: int = 4):
    results = []
    lock = threading.Lock()
    queue = list(range(n))

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                i = queue.pop()
            payload = {"text": f"load test request number {i}, a medium length "
                               f"sentence for synthesis.", "speaker": "vivian",
                       "max_new_tokens": 128}
            t0 = time.perf_counter()
            req = urllib.request.Request(base + "/synthesize",
                                         data=json.dumps(payload).encode(),
                                         headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
            dt = time.perf_counter() - t0
            with lock:
                results.append((dt, out["metrics"]["audio_s"]))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(conc)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.perf_counter() - t0
    lats = sorted(d for d, _ in results)
    audio = sum(a for _, a in results)
    print(f"{len(results)} requests in {wall:.1f}s | "
          f"p50 {lats[len(lats)//2]:.2f}s p95 {lats[int(0.95*(len(lats)-1))]:.2f}s | "
          f"server throughput {audio/wall:.2f} audio_s/s")


if __name__ == "__main__":
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))
