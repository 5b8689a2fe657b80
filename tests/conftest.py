import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4 implication; the driver validates the
# real multi-chip path separately via __graft_entry__.dryrun_multichip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin may have imported jax before this conftest ran; force the
# platform choice as long as no backend has been initialised yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# No persistent compilation cache under pytest: serializing the matcher's
# multi-hundred-MB CPU executables (put_executable_and_time -> zstd) has
# segfaulted late in the suite when the process is already holding every
# previously jitted program; CPU compiles are fast enough that the disk
# cache buys nothing here anyway.
#
# (Round-5 root cause of the "late in the suite" crashes, including the
# round-4 rc=139 at ~96 tests: every XLA:CPU compile retains mmap'd JIT
# code + guard regions — ~580 maps/test — until the process crosses
# vm.max_map_count=65530 and mmap starts failing inside
# backend_compile_and_load. jax.clear_caches() does not release them, so
# the only in-repo fix is process sharding: pytest.ini now runs the suite
# under pytest-xdist (-n 4 --dist loadfile), keeping each worker far below
# the cap.)
jax.config.update("jax_enable_compilation_cache", False)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} ({len(jax.devices())} devices)"
