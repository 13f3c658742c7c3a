"""Typed input-field descriptors for pipelines.

Mirrors the reference's ``InputDataField``/``FileInputDataField``
(nexus/fields.py:234-430): assignment-time isinstance validation against a
type or tuple of types, required-ness, defaults, and optional batch
processors (consumed by BatchPipeline). File fields resolve to Spark file
sources instead of the reference's lazy FileProxy chunk reader.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator


class _Empty:
    def __repr__(self) -> str:
        return "EMPTY"


#: optionality sentinel (reference nexus/constants.py:16-17)
EMPTY = _Empty()


def list_batch_processor(values: list, batch_size: int) -> Iterator[list]:
    """Chunk a collection into size-N batches (reference
    default_batch_processors.py:10-25)."""
    batch: list = []
    for v in values:
        batch.append(v)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def file_stream_batch_processor(stream, batch_size: int) -> Iterator[bytes]:
    """Fixed-size chunks from a byte stream (reference
    default_batch_processors.py:28-54). On Spark, prefer
    ``spark.read`` + ``spark.sql.files.maxPartitionBytes`` splitting;
    this exists for API parity with driver-side streams."""
    close = False
    if isinstance(stream, (str, bytes)):
        stream = open(stream, "rb")  # noqa: SIM115 — generator owns it
        close = True
    try:
        while True:
            chunk = stream.read(batch_size)
            if not chunk:
                break
            yield chunk
    finally:
        if close:
            stream.close()


def validate_batch_processor(fn: Callable) -> None:
    """A batch processor is a generator function ``(values, batch_size)``
    (reference utils.py:146-182)."""
    import inspect

    if not callable(fn):
        raise TypeError("batch_processor must be callable")
    params = list(inspect.signature(fn).parameters)
    if len(params) != 2:
        raise TypeError(
            f"batch_processor must accept (values, batch_size); got {params}"
        )
    if not (inspect.isgeneratorfunction(fn) or inspect.isfunction(fn)):
        raise TypeError("batch_processor must be a (generator) function")


class InputDataField:
    """Descriptor with assignment-time type validation
    (reference fields.py:322-354)."""

    def __init__(
        self,
        data_type: type | tuple[type, ...] = object,
        *,
        required: bool = False,
        default: Any = EMPTY,
        batch_processor: Callable | None = None,
        batch_size: int | None = None,
    ) -> None:
        self.data_type = data_type if isinstance(data_type, tuple) else (data_type,)
        self.required = required
        self.default = default
        self.batch_size = batch_size
        # auto-attach the list batcher for collection fields when a batch
        # size is configured (reference fields.py:265-276)
        if batch_processor is None and batch_size is not None and any(
            t in (list, tuple) for t in self.data_type
        ):
            batch_processor = list_batch_processor
        if batch_processor is not None:
            validate_batch_processor(batch_processor)
        self.batch_processor = batch_processor
        self.name: str | None = None

    def __set_name__(self, owner: type, name: str) -> None:
        self.name = name

    def __get__(self, obj: Any, objtype: type | None = None) -> Any:
        if obj is None:
            return self
        value = obj.__dict__.get(self.name, self.default)
        return None if value is EMPTY else value

    def __set__(self, obj: Any, value: Any) -> None:
        if value is None or value is EMPTY:
            if self.required:
                raise ValueError(f"field {self.name!r} is required")
            # leave the slot unset so __get__ falls back to the declared
            # default (storing the sentinel would shadow it forever)
            obj.__dict__.pop(self.name, None)
            return
        if not isinstance(value, self.data_type):
            names = "/".join(t.__name__ for t in self.data_type)
            raise TypeError(
                f"field {self.name!r} expects {names}, got {type(value).__name__}"
            )
        obj.__dict__[self.name] = value


class FileInputDataField(InputDataField):
    """A path field; events read it via Spark file sources
    (reference fields.py:370-430)."""

    def __init__(self, *, required: bool = False, chunk_size: int = 1024,
                 **kwargs: Any) -> None:
        super().__init__(
            data_type=(str,),
            required=required,
            batch_processor=kwargs.pop("batch_processor", file_stream_batch_processor),
            batch_size=chunk_size,
            **kwargs,
        )

    def __set__(self, obj: Any, value: Any) -> None:
        import os

        if value is not None and value is not EMPTY and not os.path.exists(value):
            raise ValueError(f"file {value!r} does not exist")
        super().__set__(obj, value)
