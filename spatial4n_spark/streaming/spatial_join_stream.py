"""Stream-static spatial join: streaming points x static shape layer.

The streaming complement of operators/joins.point_in_shape_join: a
landing directory of point docs joins a STATIC (broadcast) shape layer
incrementally — the standard "enrich events with the zone that contains
them" topology. Stream-static inner joins are stateless in Structured
Streaming (no watermark, no join state): each micro-batch runs the
same cell-cover equi-join + bbox gate + refine the batch operator
uses, so verdicts are bit-identical to the batch path (asserted in
tests/test_streaming_spatial_join.py).

Scale notes: the static side is re-broadcast per query start, not per
micro-batch; the streaming side has NO shuffle (source -> parse ->
cell-assign -> BroadcastHashJoin -> sink), so a 100 TB/day landing
rate splits across executors embarrassingly. For a polygon layer too
big to broadcast, pre-bucket both sides by cell (sources/bucketed.py)
and use a stream-static sort-merge join instead.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.strategy import JoinPlan


def spatial_join_stream(doc_stream: DataFrame, shapes: DataFrame,
                        plan: JoinPlan,
                        shape_col: str = "shape") -> DataFrame:
    """Streaming docs -> point spans -> shapes containing each point.

    `doc_stream` is a streaming docs(doc_id, spans) frame
    (streaming.tile_stream.read_docs_stream); `shapes` is a static
    DataFrame with a shape-struct column. Returns a streaming frame of
    (doc_id, pos, x, y, <shape cols>, relation).
    """
    from ..operators.joins import point_in_shape_join
    from ..sources.docs import extract_point_spans

    pts = extract_point_spans(doc_stream)
    return point_in_shape_join(pts, shapes, plan,
                               point_x="x", point_y="y",
                               shape_col=shape_col)
