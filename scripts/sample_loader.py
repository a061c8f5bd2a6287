"""Load benchmark-JSON sample records (schema of ref: src/main.cpp:80-118,
parsed the way the reference's scripts/sample_loader.py does)."""

from __future__ import annotations

import dataclasses
import json

import numpy as np


@dataclasses.dataclass
class Sample:
    name: str
    K: int
    R: int
    poly: np.ndarray
    total_input_bytes: int
    total_transmit_bits: int
    total_output_symbols: int
    sampling_time: float
    minimum_samples: int
    total_samples: int
    init_ns: np.ndarray
    update_ns: np.ndarray
    chainback_ns: np.ndarray
    total_bits: int
    total_bit_errors: int
    bit_error_rate: float

    @classmethod
    def from_obj(cls, v: dict) -> "Sample":
        return cls(
            name=v["name"],
            K=v["K"],
            R=v["R"],
            poly=np.asarray(v["poly"]),
            total_input_bytes=v["total_input_bytes"],
            total_transmit_bits=v["total_transmit_bits"],
            total_output_symbols=v["total_output_symbols"],
            sampling_time=v["sampling_time"],
            minimum_samples=v["minimum_samples"],
            total_samples=v["total_samples"],
            init_ns=np.asarray(v["init_ns"], dtype=np.float64),
            update_ns=np.asarray(v["update_ns"], dtype=np.float64),
            chainback_ns=np.asarray(v["chainback_ns"], dtype=np.float64),
            total_bits=v["total_bits"],
            total_bit_errors=v["total_bit_errors"],
            bit_error_rate=v["bit_error_rate"],
        )

    # Metric definitions (ref: scripts/tabulate_data.py:33, :54).
    @property
    def update_symbol_rate(self) -> np.ndarray:
        return self.total_output_symbols / (self.update_ns * 1e-9)

    @property
    def chainback_bit_rate(self) -> np.ndarray:
        return self.total_input_bytes * 8 / (self.chainback_ns * 1e-9)


def load_samples(filename: str) -> list[Sample]:
    with open(filename) as fp:
        return [Sample.from_obj(v) for v in json.load(fp)]
