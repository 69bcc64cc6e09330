"""Chapter-parity examples: every runnable program of the reference,
re-expressed as a Spark Structured Streaming topology.

Each module exposes the topology as pure DataFrame transforms (usable on a
bounded batch DataFrame or an unbounded stream — same code, Spark's
batch/streaming unification) plus a ``demo(spark)`` wiring it to live
sources and console sinks:

| reference main                         | module             |
|----------------------------------------|--------------------|
| chapter2/BasicStreamingOperations.java | basic_streaming    |
| chapter2/KeyedStreamOperations.java    | keyed_streams      |
| chapter2/StreamSplitAndCombine.java    | split_combine      |
| chapter3/WindowingOperations.java      | windowing          |
| chapter3/WindowJoins.java              | window_joins       |
| chapter4/EventTimeOperations.java      | event_time         |
| chapter5/StatefulOperations.java       | stateful           |
| chapter6/CourseUseCase.java            | course_use_case    |
"""
