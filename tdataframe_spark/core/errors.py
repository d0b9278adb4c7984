"""Engine error surface, mirroring the reference's tested error behavior.

Reference parity (SURVEY.md §2.1 "error-handling surface"):
- duplicate computed-column name throws — ``CheckTmpBranch``
  /root/reference/TDataFrame.hxx:290-297, tested
  /root/reference/tests/test_branchoverwrite.cxx:20-26. Spark's
  ``withColumn`` silently replaces, so the engine must check and raise.
- UDF arity vs column-list mismatch throws — ``PickBranchNames``
  /root/reference/TDataFrame.hxx:303-310.
- the reference also throws on use of a dead/invalid frame
  (``GetDataFrameChecked`` /root/reference/TDataFrame.hxx:994-1001,
  regression_invalidref.cxx). That error class is NOT implemented here —
  deliberately: it exists because C++ proxies can outlive the TDataFrame
  they weakly reference, while in Python every Frame/Result holds a strong
  reference to its engine and DataFrame, so a "dangling frame" is
  unconstructible by the language's lifetime rules. There is nothing to
  check at runtime.
"""


class FrameError(RuntimeError):
    """Base class for engine errors."""


class DuplicateColumnError(FrameError):
    """Raised when ``define`` would overwrite an existing column."""


class UnknownColumnError(FrameError):
    """Raised when an operation names a column the frame does not have."""


class ArityError(FrameError):
    """Raised when a UDF's arity does not match its input column list."""
