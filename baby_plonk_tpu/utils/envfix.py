"""Host-environment guards for heavy XLA:CPU workloads.

The virtual-mesh validation path (8 SPMD devices on one CPU host) JIT-
compiles executables whose code/data segments create thousands of memory
mappings EACH; a long-lived process accumulates past Linux's default
``vm.max_map_count`` of 65530, at which point mmap returns ENOMEM and
LLVM's execution engine aborts or segfaults ("LLVM compilation error:
Cannot allocate memory" — diagnosed by sampling /proc/<pid>/maps, which
hit the limit at ~6.7 GB RSS). Raising the limit is the fix; this helper
does it when privileged, warns when not.
"""
from __future__ import annotations

import os
import sys

_PATH = "/proc/sys/vm/max_map_count"


def ensure_map_count(min_count: int = 1 << 20) -> int:
    """Raise vm.max_map_count to at least ``min_count`` if possible.

    Returns the (possibly unchanged) current value. No-op on non-Linux.
    """
    try:
        with open(_PATH) as f:
            cur = int(f.read().strip())
    except OSError:
        return -1
    if cur >= min_count:
        return cur
    try:
        with open(_PATH, "w") as f:
            f.write(str(min_count))
        return min_count
    except OSError:
        print(
            f"WARNING: vm.max_map_count={cur} is too low for the virtual "
            f"multi-device CPU mesh (JIT mappings exhaust it -> LLVM ENOMEM "
            f"aborts); run `sysctl -w vm.max_map_count={min_count}` as root",
            file=sys.stderr,
            flush=True,
        )
        return cur
