"""Python wrapper for the native KITTI AP evaluator.

The reference depends on the external C++ ``kitti_native_evaluation``
submodule built with CMake and invoked as ``evaluate_object_offline
<gt_dir> <result_dir>`` (reference README.md:110-118).  Our equivalent
binary is built from cpp/kitti_eval/evaluate_object.cpp into the
package's lib directory; this module locates (or builds) it, runs it,
and parses the printed AP table.
"""

import os
import re
import subprocess
from typing import Dict

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "lib")
_BINARY = os.path.join(_LIB_DIR, "evaluate_object_offline")
_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "cpp"
)

_LINE_RE = re.compile(
    r"^(\w+)_(detection|bev|3d)_(easy|moderate|hard) "
    r"AP: ([\d.]+) AP_R40: ([\d.]+)"
)


def binary_path(build_if_missing: bool = True) -> str:
    if build_if_missing:
        from pointgnn_tpu.graph._native import stale

        if stale(_BINARY, os.path.join(_CPP_DIR, "kitti_eval")):
            # missing OR older than the sources: the committed binary
            # must track cpp/; the Makefile's rules do the actual work
            try:
                subprocess.run(["make", "-C", _CPP_DIR], check=True)
            except Exception:
                if not os.path.isfile(_BINARY):
                    raise  # nothing to fall back to
                # toolchain unavailable: the committed binary still
                # runs — warn about possible staleness instead of
                # turning a working evaluation into a crash
                import warnings

                warnings.warn(
                    "cpp/kitti_eval sources are newer than the "
                    "committed evaluate_object_offline and the rebuild "
                    "failed; using the existing binary (run "
                    "`make -C cpp` to refresh it)",
                    RuntimeWarning,
                )
    return _BINARY


def evaluate(gt_dir: str, result_dir: str) -> Dict[str, Dict[str, float]]:
    """Run the evaluator; returns
    ``{"<Class>_<metric>_<difficulty>": {"ap": x, "ap_r40": y}}``."""
    out = subprocess.run(
        [binary_path(), gt_dir, result_dir],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    results = {}
    for line in out.splitlines():
        m = _LINE_RE.match(line)
        if m:
            key = "%s_%s_%s" % (m.group(1), m.group(2), m.group(3))
            results[key] = {
                "ap": float(m.group(4)),
                "ap_r40": float(m.group(5)),
            }
    return results
