"""Task registry — importing this package registers all tasks on the Model
facade (parity with the reference's ``task_map``)."""

import kuzu.tasks.classify  # noqa: F401
import kuzu.tasks.ctc  # noqa: F401
import kuzu.tasks.detect  # noqa: F401
import kuzu.tasks.lm  # noqa: F401
import kuzu.tasks.recognize  # noqa: F401
import kuzu.tasks.obb  # noqa: F401
import kuzu.tasks.pose  # noqa: F401
import kuzu.tasks.segment  # noqa: F401
import kuzu.models.fastsam  # noqa: F401  (registers 'fastsam')
import kuzu.models.nas  # noqa: F401  (registers 'nas')
import kuzu.tasks.sam  # noqa: F401

__all__ = []
