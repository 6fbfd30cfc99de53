"""Durability layer: WAL, snapshots, storage engine, mmap vector files.

Parity with the reference persistence module (src/persistence/mod.rs:3-7).
Byte-level / syscall-sensitive paths (CRC32, WAL framing, fsync, mmap,
atomic snapshot writes) run in a native C++ core (native/walcore.cpp) with
pure-Python fallbacks producing identical bytes.
"""

from .engine import EngineConfig, StorageEngine  # noqa: F401
from .mmap_storage import MmapVectorStorage  # noqa: F401
from .serialization import (DatabaseSnapshot, SerializedVector,  # noqa: F401
                            WalEntry)
from .snapshot import SnapshotManager  # noqa: F401
from .wal import WriteAheadLog  # noqa: F401
