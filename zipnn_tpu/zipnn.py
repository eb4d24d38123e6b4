"""The ``ZipNN`` user-facing codec class.

API-compatible with the reference class (zipnn/zipnn.py:27-1218): the same
constructor knobs, ``compress``/``decompress`` entry points, byte / torch /
numpy marshalling, streaming framing and delta (XOR) modes — plus TPU-native
extensions: ``input_format="jax"`` and an ``engine`` knob selecting the
numpy golden model, the native C++ core, or the JAX/Pallas device pipeline.
"""
from __future__ import annotations

import math
import multiprocessing
import os
from typing import Optional

import numpy as np

from . import codec
from .core import dtypes
from .core.enums import EnumFormat, EnumLossy, EnumMethod
from .core.header import HEADER_LEN, Header, describe, unpack_shape, walk_frames

_FORMATS_WITH_SHAPE = (EnumFormat.TORCH.value, EnumFormat.NUMPY.value, EnumFormat.JAX.value)

# vanilla (no byte-group) path trigger, reference compress_bin:697
_VANILLA_BYTE_REORDER_32 = 0b1_01_01_001  # 329
_VANILLA_BYTE_REORDER_16 = 0b0_00_01_001  # 9


class ZipNN:
    def __init__(
        self,
        method: str = "AUTO",
        input_format: str = "byte",
        bytearray_dtype: str = "bfloat16",
        is_monotonic: int = 0,
        threads: int = 0,
        compression_threshold: float = 0.95,
        check_th_after_percent: int = 10,
        byte_reorder: int = 0,
        reorder_signbit: int = 0,
        delta_compressed_type: str = 0,
        lossy_compressed_type: str = 0,
        lossy_compressed_factor: int = 27,
        compression_chunk: int = 256 * 1024,
        is_streaming: bool = False,
        streaming_chunk: int = 1024 * 1024,
        input_file: Optional[str] = None,
        compressed_file: Optional[str] = None,
        decompressed_file: Optional[str] = None,
        zstd_level: int = 3,
        lz4_compression_level: int = 0,
        engine: str = "auto",
        huffman_table: str = "per_chunk",
    ):
        """Configure a compressor/decompressor.

        Parameters mirror the reference (see zipnn/zipnn.py:29-219).  The
        extra ``engine`` selects the execution backend: ``"auto"`` (native
        C++ core when built, else numpy), ``"numpy"``, ``"native"``, or
        ``"tpu"`` (JAX/Pallas device pipeline).
        """
        self.method = EnumMethod(method).value
        self.input_format = EnumFormat(input_format).value
        if self.input_format == EnumFormat.FILE.value:
            # the reference declares FILE in its enum but has no compress/
            # decompress branch for it (reference zipnn.py:852 raises);
            # fail fast here instead of deep inside the pipeline
            raise ValueError(
                'input_format="file" is not supported; pass bytes, torch, '
                "numpy or jax data (use the CLI tools for file workflows)"
            )
        self.bytearray_dtype = bytearray_dtype
        self.is_monotonic = is_monotonic
        # thread scaling plateaus; the reference caps at 16 (zipnn.py:177)
        self.threads = threads or min(multiprocessing.cpu_count(), 16)
        self.compression_threshold = compression_threshold
        # honored (reference accepts it but its check is dead code,
        # zipnn_core.c:554-558): bounded threshold check, see
        # codec.check_abandon_index; 0 disables
        if int(check_th_after_percent or 0) < 0:
            raise ValueError("check_th_after_percent must be >= 0 (0 disables)")
        self.check_th_after_percent = int(check_th_after_percent or 0)
        self.byte_reorder = byte_reorder
        self.reorder_signbit = reorder_signbit
        self.engine = engine
        if huffman_table not in ("per_chunk", "shared"):
            raise ValueError("huffman_table must be 'per_chunk' or 'shared'")
        # "shared": one <=8-bit table per byte plane (TPU-optimal profile;
        # still a standard container, decodable by the reference library)
        self.huffman_table = huffman_table

        self.delta_compressed_type = delta_compressed_type
        self.lossy_compressed_type = (
            EnumLossy.NONE if lossy_compressed_type is None else EnumLossy(lossy_compressed_type)
        )
        self.lossy_compressed_factor = lossy_compressed_factor

        if (compression_chunk & (compression_chunk - 1)) != 0:
            raise ValueError("compression_chunk must be a number that is a power of 2.")
        self.compression_chunk = compression_chunk

        if self.input_format != EnumFormat.BYTE.value and is_streaming:
            raise ValueError("Streaming is currently implemented only for bytes data type.")
        self.is_streaming = is_streaming

        if (streaming_chunk & (streaming_chunk - 1)) != 0:
            raise ValueError("streaming_chunk must be a number that is a power of 2.")
        self.streaming_chunk = streaming_chunk

        self.input_file = input_file
        self.compressed_file = compressed_file
        self.decompressed_file = decompressed_file

        self.zstd_level = zstd_level
        self.lz4_compression_level = lz4_compression_level

        self._version_major, self._version_minor, self._version_tiny = 0, 5, 3
        self._import_dependencies(zstd_level)

        self.header_length = HEADER_LEN
        # decompress-side state populated by _retrieve_header
        self.dtype = 0
        self.original_len = 0
        self.shape_bytes: tuple = ()

    # ------------------------------------------------------------------
    # dependencies
    # ------------------------------------------------------------------
    def _import_dependencies(self, zstd_level: int) -> None:
        self._zstd_compress = self._zstd_decompress = None
        self._lz4 = self._snappy = None
        if self.method in (EnumMethod.HUFFMAN.value, EnumMethod.AUTO.value):
            pass
        elif self.method == EnumMethod.ZSTD.value:
            try:
                import zstandard as zstd  # noqa: PLC0415
            except ImportError as exc:
                raise ImportError(
                    "zstandard library is not installed. Please install it to use zstandard compression."
                ) from exc
            self._zstd_compress = zstd.ZstdCompressor(level=zstd_level, threads=self.threads)
            self._zstd_decompress = zstd.ZstdDecompressor()
        elif self.method == EnumMethod.LZ4.value:
            try:
                import lz4.frame  # noqa: PLC0415

                self._lz4 = lz4.frame
            except ImportError as exc:
                raise ImportError(
                    "LZ4 library is not installed. Please install it to use LZ4 compression."
                ) from exc
        elif self.method == EnumMethod.SNAPPY.value:
            try:
                import snappy  # noqa: PLC0415

                self._snappy = snappy
            except ImportError as exc:
                raise ImportError(
                    "Snappy library is not installed. Please install it to use Snappy compression."
                ) from exc
        else:
            raise ValueError(f"Unsupported method {self.method}")

        if self.lossy_compressed_type != EnumLossy.NONE:
            if self.input_format != EnumFormat.TORCH.value:
                raise ValueError("When use lossy compression the input have to be torch.tensor")

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------
    def __version__(self):
        print(
            f"ZipNN version: {self._version_major}.{self._version_minor}.{self._version_tiny}"
        )

    def __metadata__(self) -> dict:
        meta = {
            "ZipNN version": f"{self._version_major}.{self._version_minor}.{self._version_tiny}",
            "Byte reorder": self.byte_reorder,
            "Bit reorder": self.reorder_signbit,
            "Method": self.method,
            "Input format": self.input_format,
            "Data type": self.bytearray_dtype,
            "Is monotonic": self.is_monotonic,
            "Threads": self.threads,
            "Compression threshold": self.compression_threshold,
            "Check threshold after percent": self.check_th_after_percent,
            "Delta compressed type": self.delta_compressed_type,
            "Lossy compressed type": self.lossy_compressed_type,
            "Lossy compressed factor": self.lossy_compressed_factor,
            "Compression chunk": self.compression_chunk,
            "Is streaming": self.is_streaming,
            "Streaming chunk": self.streaming_chunk,
            "Input file path": self.input_file,
            "Compressedfile path": self.compressed_file,
            "Decompressed file path": self.decompressed_file,
            "Engine": self.engine,
        }
        print(meta)
        return meta

    def metadata(self, file, version: bool = False):
        if version:
            if isinstance(file, str):
                with open(file, "rb") as f:
                    head = f.read(HEADER_LEN)
            else:
                head = bytes(memoryview(file)[:HEADER_LEN])
            print(f"ZipNN version: {head[2]}.{head[3]}.{head[4]}")
            return None
        meta = describe(file)
        print(meta)
        return meta

    # ------------------------------------------------------------------
    # header plumbing
    # ------------------------------------------------------------------
    def _make_header(self) -> Header:
        delta_mode = (
            0
            if self.delta_compressed_type in (None, 0, "0")
            else 1
            if self.delta_compressed_type == "byte"
            else 2
            if self.delta_compressed_type == "file"
            else 0
        )
        return Header(
            method=self.method,
            input_format=self.input_format,
            delta_mode=delta_mode,
            is_streaming=bool(self.is_streaming),
            streaming_chunk=self.streaming_chunk,
            compression_chunk=self.compression_chunk,
            version=(self._version_major, self._version_minor, self._version_tiny),
        )

    def _retrieve_header(self, ba_compress) -> int:
        hdr, consumed = Header.from_bytes(ba_compress, formats_with_shape=_FORMATS_WITH_SHAPE)
        self._byte_reorder = hdr.byte_reorder
        self._bit_reorder = hdr.bit_reorder
        self.method = hdr.method
        self.input_format = hdr.input_format
        self.lossy_compressed_type = hdr.lossy_type
        self.lossy_compressed_factor = hdr.lossy_factor
        self._lossy_is_int = hdr.lossy_is_int
        self.compression_chunk = hdr.compression_chunk
        self.dtype = hdr.dtype_code
        self.original_len = hdr.original_len
        if hdr.shape is not None:
            self.shape_bytes = hdr.shape
        return consumed

    # ------------------------------------------------------------------
    # compression
    # ------------------------------------------------------------------
    def _record_stats(self, op: str, original: int, compressed: int, seconds: float):
        from .stats import CodecStats  # noqa: PLC0415

        self.last_stats = CodecStats(
            op=op,
            original_bytes=original,
            compressed_bytes=compressed,
            seconds=seconds,
            engine=codec.resolve_engine(self.engine, getattr(self, "huffman_table", "") == "shared"),
            dtype=str(self.bytearray_dtype),
            chunk_size=self.compression_chunk,
        )

    def compress(
        self,
        data,
        compress_cpu_gpu: str = "cpu",
        delta_second_data=None,
        lossy_compressed_type: Optional[str] = None,
        lossy_compressed_factor: Optional[int] = None,
    ):
        """Compress ``data`` (bytes / torch.Tensor / np.ndarray / jax.Array).

        With ``delta_compressed_type`` configured, XORs against
        ``delta_second_data`` first; with ``is_streaming``, emits one
        independent frame per ``streaming_chunk`` (reference
        zipnn.py:560-643).
        """
        if self.delta_compressed_type == "byte":
            if delta_second_data is None or len(data) != len(delta_second_data):
                raise ValueError(
                    "Length of delta file has to match the length of the original file."
                )
        elif self.delta_compressed_type == "file":
            try:
                with open(delta_second_data, "rb") as f:
                    delta_second_data = f.read()
            except Exception:
                raise FileNotFoundError("Encountered an error when reading the delta file")
            if len(data) != len(delta_second_data):
                raise ValueError(
                    "Length of delta file has to match the length of the original file."
                )
        else:
            if delta_second_data is not None:
                raise ValueError(
                    "ZipNN isn't set for delta compression, but delta_second_data is not null."
                )

        import time as _time  # noqa: PLC0415

        _t0 = _time.perf_counter()
        result = self._compress_dispatch(data, delta_second_data)
        try:
            if hasattr(data, "numel") and hasattr(data, "element_size"):  # torch
                original = data.numel() * data.element_size()
            elif hasattr(data, "nbytes"):  # numpy / jax
                original = int(data.nbytes)
            else:
                original = len(memoryview(data))
        except Exception:
            original = 0
        self._record_stats("compress", original, len(result), _time.perf_counter() - _t0)
        return result

    def _compress_dispatch(self, data, delta_second_data):
        if self.is_streaming and self.input_format == EnumFormat.BYTE.value:
            mv_data = memoryview(data)
            mv_delta = memoryview(delta_second_data) if delta_second_data else None
            out = bytearray()
            offset = 0
            remaining = len(data)
            while remaining > 0:
                size = min(self.streaming_chunk, remaining)
                chunk = mv_data[offset : offset + size]
                if mv_delta is not None:
                    a = np.frombuffer(chunk, dtype=np.uint8)
                    b = np.frombuffer(mv_delta[offset : offset + size], dtype=np.uint8)
                    chunk = np.bitwise_xor(a, b).tobytes()
                out.extend(self._compress_one(chunk))
                offset += size
                remaining -= size
            return bytes(out)

        if delta_second_data is not None:
            a = np.frombuffer(memoryview(data), dtype=np.uint8)
            b = np.frombuffer(memoryview(delta_second_data), dtype=np.uint8)
            data = np.bitwise_xor(a, b).tobytes()
        return self._compress_one(data)

    # -- marshalling ----------------------------------------------------
    def _resolve_dtype_and_bytes(self, data):
        """Returns (dtype_code, shape, flat uint8 np array)."""
        fmt = self.input_format
        if fmt == EnumFormat.BYTE.value:
            info = dtypes.from_any(self.bytearray_dtype)
            arr = np.frombuffer(memoryview(data), dtype=np.uint8)
            return info.code, None, arr
        if fmt == EnumFormat.TORCH.value:
            import torch  # noqa: PLC0415

            info = dtypes.from_any(data.dtype)
            shape = tuple(data.shape)
            t = data.contiguous().view(-1)
            if info.code in (29, 30):  # fp8
                t = t.view(torch.uint8)
            elif info.code == 6:  # bf16
                t = t.view(torch.uint16)
            arr = t.numpy().view(np.uint8)
            return info.code, shape, arr
        if fmt == EnumFormat.NUMPY.value:
            info = dtypes.from_any(data.dtype)
            shape = data.shape
            arr = np.frombuffer(np.ascontiguousarray(data).tobytes(), dtype=np.uint8)
            return info.code, shape, arr
        if fmt == EnumFormat.JAX.value:
            info = dtypes.from_any(data.dtype)
            shape = tuple(data.shape)
            host = np.asarray(data)  # device -> host
            arr = np.ascontiguousarray(host).reshape(-1).view(np.uint8)
            return info.code, shape, arr
        raise ValueError("Unsupported input_format")

    def _lossy_prepare(self, t):
        """INTEGER lossy mode: scale to a fixed-point integer tensor when it
        fits (reference util_torch.py:10-38 + zipnn.py:869-895).

        Deviation, by design: the overflow guard compares against
        ``2**(bits-1-factor)`` — the value that keeps ``t * 2**factor``
        inside the signed integer range.  The reference's (never-invoked)
        comparator dropped the exponent (zipnn.py:893: ``bit_size - 1 -
        lossy_factor``), which would reject almost everything.
        """
        import torch  # noqa: PLC0415

        info = dtypes.from_any(t.dtype)
        bits = torch.finfo(t.dtype).bits
        factor = self.lossy_compressed_factor
        if float(t.abs().max()) < float(2 ** (bits - 1 - factor)):
            int_dtype = torch.int32 if bits == 32 else torch.int16
            t = (t * float(2**factor)).to(int_dtype)
            return t, (info.code, True)
        return t, (info.code, False)

    def _compress_one(self, data) -> bytes:
        prep = self._compress_prepare(data)
        if prep[0] == "vanilla":
            return prep[1]
        _, hdr, arr, grouping, chunk, prefix = prep
        payload = codec.compress_payload(
            arr,
            grouping.num_buf,
            grouping.bit_reorder,
            grouping.byte_reorder,
            chunk,
            self.compression_threshold,
            self.threads,
            self.engine,
            shared_tables=self.huffman_table == "shared",
            prefix_len=prefix,
            check_th_after_percent=self.check_th_after_percent,
        )
        return self._compress_finish(hdr, payload, prefix, arr.size)

    def _compress_prepare(self, data):
        """Everything in :meth:`_compress_one` before the payload encode.

        Returns ``("vanilla", frame)`` when the whole-buffer vanilla path
        applies (the frame is complete), else ``("payload", hdr, arr,
        grouping, chunk, prefix)`` for :func:`codec.compress_payload` +
        :meth:`_compress_finish`.  Split out so a pipelined writer
        (io/serving.ShardEncoder) can interleave shard N's payload
        assembly with shard N+1's device encode.
        """
        lossy = None
        if self.lossy_compressed_type == EnumLossy.INTEGER:
            if self.input_format != EnumFormat.TORCH.value:
                raise ValueError("When use lossy compression the input have to be torch.tensor")
            data, lossy = self._lossy_prepare(data)
        elif self.lossy_compressed_type == EnumLossy.UNSIGN:
            raise ValueError('lossy_compressed_type is "unsign" -> not implemented yet')

        dtype_code, shape, arr = self._resolve_dtype_and_bytes(data)

        fmt = self.input_format
        if lossy is not None:
            dtype_code, lossy_is_int = lossy  # header records the float dtype
        else:
            if fmt == EnumFormat.BYTE.value:
                is_float = dtypes.from_any(self.bytearray_dtype).is_float
            else:
                is_float = dtypes.from_code(dtype_code).is_float
            if not is_float:
                # reference supports only a (raising) uint32 path here
                # (zipnn.py:816-835)
                raise ValueError("Support only torch.dtype float32/bfloat16/float16/fp8")

        if lossy is not None and lossy[1]:
            # integer payload: plain byte planes, no sign rotation
            info = dtypes.from_code(dtype_code)
            if info.itemsize == 4:
                grouping = dtypes.Grouping(4, 220, 0, 32)
            else:
                grouping = dtypes.Grouping(2, 10, 0, 16)
        else:
            grouping = dtypes.grouping_for_code(dtype_code)

        hdr = self._make_header()
        hdr.byte_reorder = grouping.byte_reorder
        hdr.bit_reorder = grouping.bit_reorder
        hdr.dtype_code = dtype_code
        if lossy is not None:
            hdr.lossy_type = EnumLossy.INTEGER.value
            hdr.lossy_factor = self.lossy_compressed_factor
            hdr.lossy_is_int = int(lossy[1])
        if fmt in _FORMATS_WITH_SHAPE:
            hdr.shape = shape

        # vanilla whole-buffer path (explicit byte_reorder config only,
        # reference compress_bin:697-703; we fix the reference's
        # double-header quirk and write one well-formed frame)
        if (self.byte_reorder == _VANILLA_BYTE_REORDER_32 and grouping.dtype_size == 32) or (
            self.byte_reorder == _VANILLA_BYTE_REORDER_16 and grouping.dtype_size == 16
        ):
            body = self.compress_method(arr.tobytes())
            hdr.byte_reorder = self.byte_reorder
            hdr.original_len = arr.size
            hdr.total_len = HEADER_LEN + hdr.ext_len() + len(body)
            return ("vanilla", hdr.to_bytes() + body)

        chunk = codec.effective_chunk(self.compression_chunk, grouping.num_buf)
        prefix = HEADER_LEN + hdr.ext_len()
        return ("payload", hdr, arr, grouping, chunk, prefix)

    def _compress_finish(self, hdr, payload, prefix: int, orig_size: int):
        hdr.original_len = orig_size
        # header + payload share one buffer (the reference C core's
        # python_header convention, zipnn_core.c:105-121): fill the
        # reserved prefix and return a zero-copy view
        hdr.total_len = len(payload)
        payload[:prefix] = np.frombuffer(hdr.to_bytes(), np.uint8)
        return memoryview(payload)

    def compress_method(self, data: bytes) -> bytes:
        """Whole-buffer vanilla compression (reference zipnn.py:645-668)."""
        if self.method in (EnumMethod.ZSTD.value, EnumMethod.AUTO.value):
            if self._zstd_compress is None:
                import zstandard as zstd  # noqa: PLC0415

                self._zstd_compress = zstd.ZstdCompressor(
                    level=self.zstd_level, threads=self.threads
                )
                self._zstd_decompress = zstd.ZstdDecompressor()
            return self._zstd_compress.compress(data)
        if self.method == EnumMethod.LZ4.value:
            return self._lz4.compress(data)
        if self.method == EnumMethod.SNAPPY.value:
            return self._snappy.compress(data)
        raise ValueError(f"Unsupported method {self.method}")

    def decompress_method(self, data) -> bytes:
        if self.method in (EnumMethod.ZSTD.value, EnumMethod.AUTO.value):
            if self._zstd_decompress is None:
                import zstandard as zstd  # noqa: PLC0415

                self._zstd_decompress = zstd.ZstdDecompressor()
            return self._zstd_decompress.decompress(data)
        if self.method == EnumMethod.LZ4.value:
            return self._lz4.decompress(data)
        if self.method == EnumMethod.SNAPPY.value:
            return self._snappy.decompress(data)
        raise ValueError(f"Unsupported method {self.method}")

    # ------------------------------------------------------------------
    # decompression
    # ------------------------------------------------------------------
    def decompress(self, data, decompress_cpu_gpu: str = "cpu", delta_second_data=None):
        """Decompress; inverse of :meth:`compress` (reference zipnn.py:928-1005)."""
        import time as _time  # noqa: PLC0415

        _t0 = _time.perf_counter()
        result = self._decompress_dispatch(data, delta_second_data)
        try:
            out_len = len(result) if isinstance(result, (bytes, bytearray)) else (
                result.numel() * result.element_size()
                if hasattr(result, "element_size") else getattr(result, "nbytes", 0)
            )
        except Exception:
            out_len = 0
        self._record_stats("decompress", out_len, len(memoryview(data)), _time.perf_counter() - _t0)
        return result

    def _decompress_dispatch(self, data, delta_second_data=None):
        if self.delta_compressed_type == "byte":
            if delta_second_data is None:
                raise ValueError("delta_second_data is None or not set for delta compression")
        elif self.delta_compressed_type == "file":
            try:
                with open(delta_second_data, "rb") as f:
                    delta_second_data = f.read()
            except Exception:
                raise FileNotFoundError("Encountered an error when reading the delta file")
        else:
            if delta_second_data is not None:
                raise ValueError(
                    "ZipNN isn't set for delta compression, but delta_second_data is not null."
                )

        mv_data = memoryview(data)
        if len(mv_data) == 0 and self.is_streaming:
            # a streaming compress of empty input emits zero frames
            return b""
        if len(mv_data) < HEADER_LEN or bytes(mv_data[0:2]) != b"ZN":
            raise ValueError("Header should start with ZN")
        was_delta = mv_data[9]
        if was_delta == 0 and self.delta_compressed_type not in (0, "0", None):
            raise ValueError(
                "The data wasn't compressed using delta compression and you're trying to delta-decompress it."
            )
        if was_delta != 0 and self.delta_compressed_type in (0, "0", None):
            raise ValueError(
                "The data was compressed using delta compression and you're trying to decompress it normally."
            )
        mv_delta = memoryview(delta_second_data) if delta_second_data else None

        streaming_val = mv_data[13]
        if self.input_format == EnumFormat.BYTE.value and streaming_val > 127:
            out = bytearray()
            offset_delta = 0
            for offset, total in walk_frames(mv_data):
                piece = self.decompress_bin(mv_data[offset : offset + total])
                if mv_delta is not None:
                    if offset_delta + len(piece) > len(mv_delta):
                        raise ValueError(
                            "Length of delta file has to match the length of the decompressed file."
                        )
                    a = np.frombuffer(piece, dtype=np.uint8)
                    b = np.frombuffer(
                        mv_delta[offset_delta : offset_delta + len(piece)], dtype=np.uint8
                    )
                    piece = np.bitwise_xor(a, b).tobytes()
                    offset_delta += len(piece)
                out.extend(piece)
            if mv_delta is not None and offset_delta != len(mv_delta):
                raise ValueError(
                    "Length of delta file has to match the length of the decompressed file."
                )
            return bytes(out)

        if mv_delta is not None:
            plain = self.decompress_bin(mv_data)
            if len(plain) != len(mv_delta):
                raise ValueError(
                    "Length of delta file has to match the length of the decompressed file."
                )
            a = np.frombuffer(plain, dtype=np.uint8)
            b = np.frombuffer(mv_delta, dtype=np.uint8)
            return np.bitwise_xor(a, b).tobytes()
        return self.decompress_bin(mv_data)

    def decompress_bin(self, ba_compress):
        after_header = self._retrieve_header(ba_compress)
        mv = memoryview(ba_compress)

        # vanilla path: recognizable by the explicit byte_reorder codes
        if self._byte_reorder in (_VANILLA_BYTE_REORDER_32, _VANILLA_BYTE_REORDER_16):
            body = mv[after_header : self._frame_end(mv)]
            # the reference's vanilla writer emits the 32-byte header TWICE
            # (zipnn.py:700-703: `header + (header + compressed)`, only the
            # outer copy's total_len updated).  Our writer emits one
            # well-formed frame, but to decode anything the reference ever
            # wrote, detect the repeated header (same magic + same bytes
            # [2:24]; only [24:32] differs) and skip it.
            if (
                len(body) >= HEADER_LEN
                and bytes(body[:2]) == b"ZN"
                and bytes(body[2:24]) == bytes(mv[2:24])
            ):
                body = body[HEADER_LEN:]
            ba_decom = self.decompress_method(body)
            if self.input_format == EnumFormat.BYTE.value:
                return ba_decom
            raise ValueError("Vanilla method path supports byte format only")

        num_buf = dtypes.groups_for_decompress(self.dtype)
        chunk = codec.effective_chunk(self.compression_chunk, num_buf)
        # jax output + tpu engine: keep the decompressed bytes on device
        to_device = (
            self.input_format == EnumFormat.JAX.value
            and codec.resolve_engine(self.engine) == "tpu"
        )
        flat = codec.decompress_payload(
            mv[after_header : self._frame_end(mv)],
            num_buf,
            self._bit_reorder,
            self._byte_reorder,
            chunk,
            self.original_len,
            self.threads,
            self.engine,
            to_device=to_device,
        )
        return self._marshal_out(flat)

    def _frame_end(self, mv) -> int:
        total = int.from_bytes(mv[24:32], "little")
        return total if 0 < total <= len(mv) else len(mv)

    def _marshal_out(self, flat: np.ndarray):
        fmt = self.input_format
        if fmt == EnumFormat.BYTE.value:
            # reference parity (zipnn.py:1155 returns the C core's
            # memoryview): zero-copy view over the decode buffer — the
            # .tobytes() this replaces cost ~35 ms per 64 MB
            if isinstance(flat, np.ndarray):
                return memoryview(flat)
            return flat.tobytes()
        code = self.dtype
        if fmt == EnumFormat.TORCH.value:
            import torch  # noqa: PLC0415

            lossy_type = self.lossy_compressed_type
            lossy_val = lossy_type.value if isinstance(lossy_type, EnumLossy) else lossy_type
            if lossy_val == EnumLossy.INTEGER.value and getattr(self, "_lossy_is_int", 0):
                info = dtypes.from_code(code)
                int_np = np.int32 if info.itemsize == 4 else np.int16
                arr = flat.view(int_np).reshape(self.shape_bytes)
                t = torch.from_numpy(arr.copy()).to(torch.float32)
                t = t / float(2**self.lossy_compressed_factor)
                return t.to(dtypes.torch_dtype(info))

            if code in (1, 2):
                arr = flat.view(np.float32).reshape(self.shape_bytes)
                return torch.from_numpy(arr.copy())
            if code == 6:
                arr = flat.view(np.uint16).reshape(self.shape_bytes)
                return torch.from_numpy(arr.copy()).view(torch.bfloat16)
            if code in (4, 5):
                arr = flat.view(np.float16).reshape(self.shape_bytes)
                return torch.from_numpy(arr.copy())
            if code in (29, 30):
                arr = flat.reshape(self.shape_bytes)
                t = torch.from_numpy(arr.copy())
                return t.view(torch.float8_e5m2 if code == 30 else torch.float8_e4m3fn)
            raise ValueError(f"Unsupported Dtype {code}")
        if fmt == EnumFormat.NUMPY.value:
            info = dtypes.from_code(code)
            arr = flat.view(dtypes.numpy_dtype(info)).reshape(self.shape_bytes)
            return arr.copy()
        if fmt == EnumFormat.JAX.value:
            import jax.numpy as jnp  # noqa: PLC0415
            import ml_dtypes  # noqa: PLC0415

            info = dtypes.from_code(code)
            from .ops import jax_transforms  # noqa: PLC0415

            if isinstance(flat, jax_transforms.DeviceWords):
                # device-resident retype: ONE fused dispatch produces the
                # typed leaf AND an integer-domain hazard count.  TPU
                # float-typed relayouts canonicalize NaN payloads and
                # flush bf16/fp8 denormals (jax_transforms width-conversion
                # rules), so a nonzero count means the cheap device retype
                # would not be bit-exact — marshal those (rare,
                # pathological-weight) streams through the host instead:
                # fetching the words and uploading the final dtype view
                # preserves every bit pattern.
                res = jax_transforms.words_to_typed(
                    flat, code, tuple(self.shape_bytes)
                )
                if res is not None:
                    arr, hazard = res
                    if int(hazard) == 0:
                        return arr
                flat = flat.to_numpy()  # exact host fallback
            np_map = {
                6: ml_dtypes.bfloat16,
                29: ml_dtypes.float8_e4m3fn,
                30: ml_dtypes.float8_e5m2,
            }
            view_dtype = np_map.get(code) or dtypes.numpy_dtype(info)
            arr = flat.view(view_dtype).reshape(self.shape_bytes)
            return jnp.asarray(arr)
        raise ValueError(f"Unsupported input_format {fmt}")

    def decompress_read_file(self, data=None):
        filename = data if data is not None else self.compressed_file
        if not os.path.exists(filename):
            raise FileNotFoundError(f"The file at {filename} was not found.")
        with open(filename, "rb") as f:
            return self.decompress_bin(f.read())

    def write_bin(self, ba_decom) -> int:
        with open(self.decompressed_file, "wb") as f:
            f.write(ba_decom)
        return 0
