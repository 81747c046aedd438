"""tungsten_server equivalent: render with an embedded HTTP status server.

Endpoints (parity with ref src/tungsten-server/tungsten-server.cpp:67-118):
  /status  -> JSON {state, current_spp, next_spp, total_spp, queue, ...}
  /render  -> PNG of the live (tonemapped) framebuffer
  /log     -> plain-text log tail

Usage: python -m tungsten_tpu.server [--port 8080] scene.json
"""
from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class RenderStatus:
    def __init__(self):
        self.lock = threading.Lock()
        self.state = "idle"
        self.current_spp = 0
        self.next_spp = 0
        self.total_spp = 0
        self.scene = ""
        self.queue = []
        self.framebuffer = None       # numpy HDR
        self.tonemap = "gamma"
        self.log_lines: list[str] = []
        self.start_time = time.time()
        # observability (SURVEY §5.5): per-chip throughput + gradient
        # norm (differentiable sessions); updated per spp round
        self.n_chips = 1
        self.rays_total = 0
        self.mrays_per_s = 0.0
        self.mrays_per_s_per_chip = 0.0
        self.grad_norm = None

    def log(self, msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        with self.lock:
            self.log_lines.append(line)
            self.log_lines = self.log_lines[-500:]
        print(line)

    def to_json(self):
        with self.lock:
            return json.dumps({
                "state": self.state,
                "current_spp": self.current_spp,
                "next_spp": self.next_spp,
                "total_spp": self.total_spp,
                "current_scene": self.scene,
                "queued_scenes": list(self.queue),
                "uptime_s": round(time.time() - self.start_time, 1),
                "n_chips": self.n_chips,
                "rays_total": self.rays_total,
                "mrays_per_s": round(self.mrays_per_s, 3),
                "mrays_per_s_per_chip": round(self.mrays_per_s_per_chip,
                                              3),
                "grad_norm": self.grad_norm,
            })

    def record_round(self, rays, seconds):
        """Per-round throughput accounting (per-chip rays/s is the
        north-star metric; chips = local device count)."""
        with self.lock:
            self.rays_total += int(rays)
            if seconds > 0:
                self.mrays_per_s = rays / seconds / 1e6
                self.mrays_per_s_per_chip = \
                    self.mrays_per_s / max(self.n_chips, 1)

    def render_png(self):
        import numpy as np
        import jax.numpy as jnp
        from tungsten_tpu.cameras.camera import tonemap
        from PIL import Image
        with self.lock:
            fb = None if self.framebuffer is None else self.framebuffer.copy()
            tm = self.tonemap
        if fb is None:
            fb = np.zeros((16, 16, 3), np.float32)
        ldr = np.clip(np.asarray(tonemap(tm, jnp.asarray(fb))), 0, 1)
        img = Image.fromarray((ldr * 255 + 0.5).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()


STATUS = RenderStatus()


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def do_GET(self):
        if self.path.startswith("/status"):
            body = STATUS.to_json().encode()
            ctype = "application/json"
        elif self.path.startswith("/render"):
            body = STATUS.render_png()
            ctype = "image/png"
        elif self.path.startswith("/log"):
            with STATUS.lock:
                body = "\n".join(STATUS.log_lines).encode()
            ctype = "text/plain"
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def serve(port: int) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    STATUS.log(f"HTTP server listening on :{port}")
    return httpd


def render_with_server(scene_paths, port=8080, spp=None):
    import numpy as np
    from dataclasses import replace
    from tungsten_tpu.scene.flatten import load_flat_scene
    from tungsten_tpu.render import render_pass

    serve(port)
    STATUS.queue = list(scene_paths)
    for path in scene_paths:
        with STATUS.lock:
            STATUS.queue.remove(path)
            STATUS.scene = path
            STATUS.state = "loading"
        STATUS.log(f"Loading {path}")
        scene, settings = load_flat_scene(path)
        if spp:
            settings = replace(settings, spp=spp)
        with STATUS.lock:
            STATUS.total_spp = settings.spp
            STATUS.current_spp = 0
            STATUS.tonemap = settings.tonemap
            STATUS.state = "rendering"
        import jax
        with STATUS.lock:
            STATUS.n_chips = jax.local_device_count()
        acc = np.zeros((settings.height, settings.width, 3))
        done = 0
        step = max(1, settings.spp_step)
        while done < settings.spp:
            chunk = min(step, settings.spp - done)
            with STATUS.lock:
                STATUS.next_spp = done + chunk
            t0 = time.time()
            out, rays = render_pass(scene, settings, np.uint32(done),
                                    np.uint32(settings.seed), spp_chunk=chunk)
            acc += np.asarray(out)
            STATUS.record_round(rays, time.time() - t0)
            done += chunk
            with STATUS.lock:
                STATUS.current_spp = done
                STATUS.framebuffer = acc / done
            STATUS.log(f"Completed {done}/{settings.spp} spp")
        with STATUS.lock:
            STATUS.state = "done"
        STATUS.log(f"Finished {path}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="tungsten_tpu.server")
    p.add_argument("scenes", nargs="+")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--spp", type=int, default=None)
    args = p.parse_args(argv)
    render_with_server(args.scenes, port=args.port, spp=args.spp)
    # keep serving after render completes
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
