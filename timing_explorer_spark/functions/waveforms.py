"""Waveform column expressions — reference function parity, stateless.

The reference implements these as (stateful) Flink MapFunctions
(/root/reference/src/main/java/com/ververica/functions/SawtoothFunction.java:30-79,
SineWaveFunction.java:27-33, AssignKeyFunction.java:24-36). Here they are pure
Catalyst column expressions over an event index / timestamp — fully
whole-stage-codegen'd, no state, no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def sawtooth(index: Column, num_steps: int = 10) -> Column:
    """(i % numSteps) / numSteps — SawtoothFunction.java:72-77 without the
    ListState step counter (the step IS the event index modulo numSteps)."""
    return (index % num_steps).cast("double") / float(num_steps)


def sawtooth_from_ts(ts_ms: Column, period_ms: int = 100, num_steps: int = 10) -> Column:
    """Derive the sawtooth phase directly from the event timestamp: the
    generator's clock advances exactly period_ms per event
    (TimestampSource.java:71-72), so index = ts_ms / period_ms."""
    return sawtooth(F.floor(ts_ms / period_ms), num_steps)


def sine_wave(phase: Column) -> Column:
    """sin(phase * 2π) — SineWaveFunction.java:29-32."""
    return F.sin(phase * F.lit(TWO_PI))


def assign_key(key: str) -> Column:
    """Constant key column — AssignKeyFunction.java:24-36."""
    return F.lit(key)
