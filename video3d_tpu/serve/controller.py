"""Serving controller: worker registry with heartbeat expiry + dispatch.

Re-implements the reference controller's API surface
(/root/reference/llava/serve/controller.py:57-298 — register_worker,
receive_heart_beat, refresh_all_workers, list_models, get_worker_address
with lottery/shortest-queue dispatch, worker_api_generate proxy) on the
Python stdlib HTTP server, so serving needs no FastAPI/uvicorn. Unlike the
reference serve stack, workers here run the full 3D pipeline (video_dict
support) — see model_worker.py.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from video3d_tpu.constants import CONTROLLER_HEART_BEAT_EXPIRATION


@dataclass
class WorkerInfo:
    model_names: list
    speed: float
    queue_length: int
    last_heart_beat: float = field(default_factory=time.time)


def _post_json(url: str, payload: dict, timeout: float = 30.0) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"{}")


class Controller:
    def __init__(self, dispatch_method: str = "shortest_queue"):
        assert dispatch_method in ("lottery", "shortest_queue")
        self.dispatch_method = dispatch_method
        self.workers: Dict[str, WorkerInfo] = {}
        self.lock = threading.Lock()

    # ---- registry (controller.py:77-154) ----

    def register_worker(self, worker_name: str, check_heart_beat: bool,
                        worker_status: Optional[dict] = None) -> bool:
        status = worker_status or {"model_names": [], "speed": 1, "queue_length": 0}
        with self.lock:
            self.workers[worker_name] = WorkerInfo(
                model_names=status["model_names"], speed=status["speed"],
                queue_length=status["queue_length"])
        return True

    def receive_heart_beat(self, worker_name: str, queue_length: int) -> bool:
        with self.lock:
            info = self.workers.get(worker_name)
            if info is None:
                return False
            info.queue_length = queue_length
            info.last_heart_beat = time.time()
            return True

    def remove_stale_workers(self) -> None:
        expire = time.time() - CONTROLLER_HEART_BEAT_EXPIRATION
        with self.lock:
            stale = [n for n, info in self.workers.items()
                     if info.last_heart_beat < expire]
            for n in stale:
                del self.workers[n]

    def refresh_all_workers(self) -> None:
        with self.lock:
            names = list(self.workers.items())
        for name, info in names:
            try:
                status = _post_json(name + "/worker_get_status", {})
                self.register_worker(name, True, status)
            except Exception:
                with self.lock:
                    self.workers.pop(name, None)

    def list_models(self) -> list:
        with self.lock:
            names = set()
            for info in self.workers.values():
                names.update(info.model_names)
            return sorted(names)

    # ---- dispatch (controller.py:156-228) ----

    def get_worker_address(self, model_name: str) -> str:
        self.remove_stale_workers()
        with self.lock:
            candidates = [(n, i) for n, i in self.workers.items()
                          if model_name in i.model_names]
            if not candidates:
                return ""
            if self.dispatch_method == "lottery":
                speeds = np.array([i.speed for _, i in candidates], np.float64)
                speeds = speeds / speeds.sum()
                idx = int(np.random.choice(len(candidates), p=speeds))
                return candidates[idx][0]
            # shortest_queue, speed-normalized
            qlens = [i.queue_length / max(i.speed, 1e-6) for _, i in candidates]
            idx = int(np.argmin(qlens))
            candidates[idx][1].queue_length += 1
            return candidates[idx][0]


class _ControllerHandler(BaseHTTPRequestHandler):
    controller: Controller = None

    def log_message(self, *args):  # quiet
        pass

    def _reply(self, payload: dict, code: int = 200):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        data = json.loads(self.rfile.read(n) or b"{}")
        c = self.controller
        if self.path == "/register_worker":
            ok = c.register_worker(data["worker_name"],
                                   data.get("check_heart_beat", True),
                                   data.get("worker_status"))
            self._reply({"exist": ok})
        elif self.path == "/receive_heart_beat":
            exist = c.receive_heart_beat(data["worker_name"], data["queue_length"])
            self._reply({"exist": exist})
        elif self.path == "/refresh_all_workers":
            c.refresh_all_workers()
            self._reply({})
        elif self.path == "/list_models":
            self._reply({"models": c.list_models()})
        elif self.path == "/get_worker_address":
            self._reply({"address": c.get_worker_address(data["model"])})
        elif self.path in ("/worker_generate", "/worker_ground"):
            addr = c.get_worker_address(data.get("model", ""))
            if not addr:
                self._reply({"error": "no worker", "error_code": 2}, 503)
                return
            self._reply(_post_json(addr + self.path, data, timeout=600))
        else:
            self._reply({"error": f"unknown path {self.path}"}, 404)


def serve_controller(host: str = "127.0.0.1", port: int = 21001,
                     dispatch_method: str = "shortest_queue",
                     background: bool = False):
    controller = Controller(dispatch_method)
    handler = type("Handler", (_ControllerHandler,), {"controller": controller})
    server = ThreadingHTTPServer((host, port), handler)
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return controller, server
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=21001)
    parser.add_argument("--dispatch-method", default="shortest_queue")
    args = parser.parse_args()
    serve_controller(args.host, args.port, args.dispatch_method)
