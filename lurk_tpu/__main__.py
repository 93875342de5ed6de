import os
import sys


def _guard_dead_device_tunnel():
    """A wedged device plugin hangs `import jax` at plugin discovery even
    under JAX_PLATFORMS=cpu, freezing the CLI before the prompt. Probe in
    a subprocess; on failure re-exec on pure-CPU jax (the REPL remains
    fully functional - proving just runs on the host)."""
    if os.environ.get("JAX_PLATFORMS", "") in ("cpu", "") \
            or os.environ.get("LURK_TPU_CLI_REEXEC") == "1":
        return
    import subprocess
    try:
        res = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=60, capture_output=True)
        if res.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    env = dict(os.environ)
    env["LURK_TPU_CLI_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""
    print("warning: device backend unreachable; continuing on CPU",
          file=sys.stderr)
    os.execve(sys.executable, [sys.executable, "-m", "lurk_tpu",
                               *sys.argv[1:]], env)


_guard_dead_device_tunnel()

from .cli import run  # noqa: E402

sys.exit(run())
