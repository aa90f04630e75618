"""Driver-memory autodetection: the cgroup ancestry walk.

A flat 31g heap default on a cgroup-limited container gets the JVM
OOM-killed by the kernel; _default_driver_memory sizes the heap off
the TIGHTEST limit along the process's own cgroup ancestry.  Reading
only the root cgroup paths misses nested limits (systemd slice, k8s
pod without a cgroup namespace) — these tests pin the walk.
"""

from __future__ import annotations

from chewdata_spark.session import (
    _cgroup_limit_paths,
    _default_driver_memory,
    _host_memory_bytes,
)


def test_v2_nested_walk_emits_own_then_ancestors_then_root():
    paths = _cgroup_limit_paths("0::/kubepods/burstable/pod42/ctr\n")
    assert paths[:4] == [
        "/sys/fs/cgroup/kubepods/burstable/pod42/ctr/memory.max",
        "/sys/fs/cgroup/kubepods/burstable/pod42/memory.max",
        "/sys/fs/cgroup/kubepods/burstable/memory.max",
        "/sys/fs/cgroup/kubepods/memory.max",
    ]
    assert "/sys/fs/cgroup/memory.max" in paths
    # v1 root fallback always present (hybrid hosts)
    assert "/sys/fs/cgroup/memory/memory.limit_in_bytes" in paths


def test_v1_memory_controller_walk():
    content = "12:cpu:/x\n3:memory,hugetlb:/slice/app\n"
    paths = _cgroup_limit_paths(content)
    assert paths[0] == "/sys/fs/cgroup/memory/slice/app/memory.limit_in_bytes"
    assert paths[1] == "/sys/fs/cgroup/memory/slice/memory.limit_in_bytes"
    # non-memory v1 controllers contribute nothing
    assert not any("/cpu/" in p for p in paths)


def test_namespaced_root_degenerates_to_root_paths_without_dupes():
    paths = _cgroup_limit_paths("0::/\n")
    assert paths == [
        "/sys/fs/cgroup/memory.max",
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",
    ]


def test_unreadable_proc_still_yields_root_fallbacks():
    paths = _cgroup_limit_paths("")
    assert "/sys/fs/cgroup/memory.max" in paths
    assert "/sys/fs/cgroup/memory/memory.limit_in_bytes" in paths


def test_detection_on_this_host_is_sane():
    total = _host_memory_bytes()
    assert total > 0  # CI hosts always expose SC_PHYS_PAGES at minimum
    mem = _default_driver_memory()
    assert mem.endswith(("g", "m"))
    mb = int(mem[:-1]) * (1024 if mem.endswith("g") else 1)
    # never more than ~45% of the ceiling, never above the 31g
    # compressed-oops cap, never below Spark's practical minimum.
    # The 46% bound only applies when the 512m floor is not binding:
    # on a sub-~1.1 GiB cgroup the code DELIBERATELY returns 512m
    # (its docstring defends the floor) and the proportional bound
    # would contradict that design
    assert 512 <= mb <= 31 * 1024
    if mb > 512:
        assert mb << 20 <= int(total * 0.46) + (1 << 20)
