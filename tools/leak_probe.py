"""Isolate the per-epoch host-RSS growth seen in the 40-epoch FRCNN
artifact run (RSS 3 GB -> 10.5 GB over ~30 epochs, ~230 MB/epoch —
suspiciously one params-sized f32 copy per checkpoint save).

Runs a tiny synthetic Faster R-CNN train twice on the CPU backend:
with per-epoch orbax saves (production path) and with saves no-op'd,
printing RSS at every epoch boundary. If growth only appears with
saves on, the leak is in the checkpoint path, not the step loop.

RESULT (2026-08-18, this rig): both arms FLAT (saves_on -75.7 MB/epoch
tail, saves_off +0.6 MB/epoch over 6 epochs) — neither the train/eval
step loop nor the orbax save path leaks per epoch. The artifact run's
growth is therefore gradual host-allocator/XLA-CPU-arena fragmentation
over a multi-hour single-core CPU run, not a structural leak in the
trainer (TPU runs keep params on device and epochs are ~100x shorter)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


def run(tag: str, save_enabled: bool, epochs: int = 6):
    from object_detectors_tpu import detection_main as DM

    orig_save = DM._save
    rss_at = []

    def probe_save(ckpt, stag, ts, epoch, metric):
        if save_enabled:
            orig_save(ckpt, stag, ts, epoch, metric)
        if stag == "last":
            rss_at.append((epoch, rss_mb()))
            print(f"[{tag}] epoch {epoch}: rss {rss_mb():.0f} MB",
                  flush=True)

    DM._save = probe_save
    try:
        DM.main([
            "--dataset", "synthetic", "--model",
            "fasterrcnn_resnet50_fpn", "--renderable",
            "--epochs", str(epochs), "--batch-size", "2",
            "--image-size", "64", "--lr", "1e-3",
            "--output-dir", f"/tmp/leakprobe_{tag}", "--seed", "0",
        ])
    finally:
        DM._save = orig_save
    if len(rss_at) >= 3:
        # growth per epoch over the tail (skip warmup epochs)
        g = (rss_at[-1][1] - rss_at[1][1]) / (rss_at[-1][0] - rss_at[1][0])
        print(f"[{tag}] tail growth: {g:.1f} MB/epoch", flush=True)
    return rss_at


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("saves", "both"):
        run("saves_on", True)
    if which in ("nosave", "both"):
        run("saves_off", False)
