package graft.core

/** Typed exceptions (reference: src/trousse/exceptions.py:4-35),
  * extending IllegalArgumentException so generic require-style handling
  * still works.
  */
class MultipleOperationsFoundException(msg: String)
    extends IllegalArgumentException(msg)

/** Raised when a persisted-dataset path is not a graft dataset
  * (reference `NotShelveFileError`).
  */
class NotGraftDatasetException(msg: String)
    extends IllegalArgumentException(msg)

/** Raised when a lineage lookup finds no producing operation
  * (reference `MultipleObjectsInFileError` family — lookup contract
  * violations).
  */
class OperationNotFoundException(msg: String)
    extends IllegalArgumentException(msg)

/** Raised when a dataset sidecar (lineage.json) exists but cannot be
  * parsed — distinct from [[NotGraftDatasetException]] (no sidecar at
  * all) so callers can tell corruption from absence.
  */
class MalformedSidecarException(msg: String)
    extends IllegalArgumentException(msg)
