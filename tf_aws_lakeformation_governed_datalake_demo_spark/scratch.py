"""Process-lifetime scratch directories for operator sinks.

Registry queries return LAZY DataFrames over files they just wrote, so a
sink directory must outlive the builder call (the driver collects the
result later). Deleting eagerly would break that contract; never deleting
leaks one tree per invocation under /tmp (round-5 ADVICE). The middle
ground used here: every scratch dir is registered for removal at
interpreter exit, so each driver / bench / pytest run cleans up after
itself while results stay readable for the whole process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def scratch_dir(prefix: str) -> str:
    """A temp directory removed automatically at process exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
