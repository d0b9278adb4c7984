"""Engine error surface, mirroring the reference's tested error behavior.

Reference parity (SURVEY.md §2.1 "error-handling surface"):
- duplicate computed-column name throws — ``CheckTmpBranch``
  /root/reference/TDataFrame.hxx:290-297, tested
  /root/reference/tests/test_branchoverwrite.cxx:20-26. Spark's
  ``withColumn`` silently replaces, so the engine must check and raise.
- UDF arity vs column-list mismatch throws — ``PickBranchNames``
  /root/reference/TDataFrame.hxx:303-310.
- use of a dead/invalid frame throws — ``GetDataFrameChecked``
  /root/reference/TDataFrame.hxx:994-1001.
"""


class FrameError(RuntimeError):
    """Base class for engine errors."""


class DuplicateColumnError(FrameError):
    """Raised when ``define`` would overwrite an existing column."""


class UnknownColumnError(FrameError):
    """Raised when an operation names a column the frame does not have."""


class ArityError(FrameError):
    """Raised when a UDF's arity does not match its input column list."""
