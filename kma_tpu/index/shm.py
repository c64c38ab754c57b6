"""Cross-run DB residency: the POSIX analog of the reference's SysV
shared-memory tool (shm.c:419-700) plus -mmap array mapping (kmmap.c:33).

The reference pins index files in SysV segments keyed by ftok(file); a
second kma process attaches instead of re-reading.  Here the pinned copy
is a file under /dev/shm (tmpfs: one page-cache-resident copy shared by
every process that maps it), keyed by the ABSOLUTE path of the source, so
`kma shm -t_db X` + `kma -shm 1 ...` across processes behave like the
reference pair.  -mmap swaps np.fromfile for np.memmap so the arrays are
demand-paged rather than copied into anonymous memory -- on tmpfs-pinned
files that makes DB "loading" O(1).

shmLvl bit -> file: 1 .comp.b (2: .decon.comp.b), 4 .length.b,
8 .seq.b, 16 .name  (shm.c:500-660).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
from typing import List

SHM_DIR = os.environ.get("KMA_TPU_SHM_DIR", "/dev/shm")

_LVL_EXTS = ((1, ".comp.b"), (2, ".decon.comp.b"), (4, ".length.b"),
             (8, ".seq.b"), (16, ".name"))


def shm_key(path: str) -> str:
    """tmpfs copy path of a DB file (the ftok() analog)."""
    ap = os.path.abspath(path)
    h = hashlib.sha1(ap.encode()).hexdigest()[:16]
    return os.path.join(SHM_DIR, "kma_tpu_%s_%s" % (h,
                                                    os.path.basename(ap)))


def resolve(path: str, shm: int = 0) -> str:
    """The shared copy when -shm is set and one exists, else the path."""
    if shm:
        sp = shm_key(path)
        if os.path.exists(sp):
            return sp
    return path


def shm_setup(db_prefix: str, lvl: int, destroy: bool = False) -> int:
    """kma shm setup/teardown for one DB prefix; returns exit status."""
    status = 0
    for bit, ext in _LVL_EXTS:
        if not (lvl & bit):
            continue
        src = db_prefix + ext
        dst = shm_key(src)
        if destroy:
            if os.path.exists(dst):
                os.remove(dst)
            elif not os.path.exists(src):
                print("Error: %d (%s)" % (2, os.strerror(2)),
                      file=sys.stderr)
                status |= 2
        else:
            if not os.path.exists(src):
                # bit 2 (.decon) is routinely absent; mirror the
                # reference's per-file errno report
                print("Error: %d (%s)" % (2, os.strerror(2)),
                      file=sys.stderr)
                status |= 2
                continue
            tmp = dst + ".tmp.%d" % os.getpid()
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)
    return status


def shm_list() -> List[str]:
    return [f for f in os.listdir(SHM_DIR) if f.startswith("kma_tpu_")]
