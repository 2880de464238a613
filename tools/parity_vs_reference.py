"""Golden parity harness: ptx vs the ACTUAL reference binary.

Builds the reference from source in SERVER_ONLY mode (no SDL), serves it
on localhost, drives its ASCII block protocol, and compares block-level
statistics against a ptx render of the identical scene + sky asset.
Round-1 results are recorded in BASELINE.md ("Golden parity" section):
sky ≤0.1%, bulb core ≤0.1% (0.7% median), lens area ~8% (reference noise).

Usage (needs g++, libpng headers, ~15 min; writes nothing to the repo):
    python tools/parity_vs_reference.py [--workdir /tmp/refbuild]
"""

from __future__ import annotations

import argparse
import os
import shutil
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"

BLOCKS = [  # (x, y): sky corner, sky gradient, glass bulb, lens area
    (64, 64), (1600, 200), (1176, 486), (620, 430)]
BLOCK = 108


def build_reference(workdir: str) -> str:
    os.makedirs(workdir, exist_ok=True)
    for d in ("src", "include"):
        shutil.copytree(os.path.join(REF, d), os.path.join(workdir, d),
                        dirs_exist_ok=True)
    # shims for libpng>=1.5 (the reference targets 1.2-era macros)
    pd = os.path.join(workdir, "src", "png_decoder.cpp")
    s = open(pd).read()
    if "#include <cstring>" not in s:
        s = "#include <cstring>\n" + s
    s = (s.replace("png_infopp_NULL", "(png_infopp)NULL")
          .replace("int_p_NULL", "(int*)NULL")
          .replace("png_voidp_NULL", "(png_voidp)NULL"))
    open(pd, "w").write(s)
    out = os.path.join(workdir, "ref-server")
    subprocess.run(
        ["g++", "-O3", "-DSERVER_ONLY", "-Iinclude"]
        + sorted(os.path.join("src", f) for f in os.listdir(
            os.path.join(workdir, "src")) if f.endswith(".cpp"))
        + ["-o", "ref-server", "-lpng", "-lpthread", "-lrt"],
        cwd=workdir, check=True)
    # assets: demo scene loads these from cwd at static init
    for a in ("test.hdr", "test2.hdr"):
        shutil.copy(os.path.join(REF, a), workdir)
    from ptx.scenes.builders import procedural_sky_image
    from ptx.io import hdr
    sky_path = os.path.join(workdir, "Serpentine_Valley_3k.hdr")
    if not os.path.exists(sky_path):
        hdr.write(sky_path, procedural_sky_image(1536, 3072)[..., :3])
    return out


def fetch_block(x, y, size, port=12346, timeout=1200):
    buf = np.full((size + 1, size + 1, 3), np.nan, np.float32)
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
        except OSError:
            time.sleep(1)
            continue
        f = s.makefile("rwb")
        if f.readline().strip() != b"1":
            s.close()
            time.sleep(1)
            continue
        f.write(f"{x} {y} {size}\n".encode())
        f.flush()
        while True:
            line = f.readline()
            if not line:
                break
            c = line[:1]
            if c == b"P":
                coord, _, rgb = line[1:].strip().decode().partition("=")
                px, py = map(int, coord.split(","))
                buf[py - y, px - x] = tuple(map(float, rgb.split(",")))
            elif c == b"F":
                s.close()
                return buf
        s.close()
        time.sleep(1)
    return buf


def cell_means(img, n=6):
    h = img.shape[0] // n
    out = np.full((n, n, 3), np.nan)
    for i in range(n):
        for j in range(n):
            c = img[i * h:(i + 1) * h, j * h:(j + 1) * h]
            m = np.isfinite(c[..., 0])
            if m.any():
                out[i, j] = np.nanmean(c[m], axis=0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/refbuild")
    ap.add_argument("--spp", type=int, default=16)
    args = ap.parse_args()

    build_reference(args.workdir)
    srv = subprocess.Popen(["./ref-server"], cwd=args.workdir,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    try:
        import jax
        import jax.numpy as jnp
        from ptx.integrate.camera import Camera
        from ptx.integrate.render import _render_rows
        from ptx.integrate.trace import compile_scene
        from ptx.io import hdr
        from ptx.scenes.builders import make_world

        sky = hdr.read(os.path.join(args.workdir,
                                    "Serpentine_Valley_3k.hdr"))
        scene = compile_scene(make_world(sky_image=sky))
        cam = Camera.reference_demo(1920, 1080)

        worst = 0.0
        for (x, y) in BLOCKS:
            ref_blk = fetch_block(x, y, BLOCK)[:BLOCK, :BLOCK]
            ptx_blk = np.asarray(_render_rows(
                scene, scene.params, cam, jax.random.PRNGKey(3),
                jnp.int32(y), BLOCK, args.spp, 16))[:, x:x + BLOCK]
            rc, pc = cell_means(ref_blk), cell_means(ptx_blk)
            rel = np.abs(pc - rc) / (np.abs(rc) + 1e-4)
            med = float(np.nanmedian(rel))
            worst = max(worst, med)
            print(f"block {x:4d},{y:4d}: ref {np.nanmean(rc):.4f} "
                  f"ptx {np.nanmean(pc):.4f} median relerr {med:.3f}")
        print(f"worst median relerr: {worst:.3f}")
        return 0 if worst < 0.15 else 1
    finally:
        srv.terminate()
        srv.wait()


if __name__ == "__main__":
    raise SystemExit(main())
