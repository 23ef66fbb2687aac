from av1tpu.ingest.yuv import (  # noqa: F401
    Yuv420p10Geometry,
    infer_resolution,
    iter_y_frames,
    read_y_frame,
    read_y_frames_batch,
)
from av1tpu.ingest.tiler import (  # noqa: F401
    TileGrid,
    extract_labeled_blocks,
    join_blocks_with_labels,
    label_cols_from_units,
    tile_frame,
    tile_frames,
)
from av1tpu.ingest.partition_dump import (  # noqa: F401
    DumpParseResult,
    FrameBlocks,
    discover_dump_files,
    parse_dump_directory,
    parse_dump_file,
)
from av1tpu.ingest.etl import (  # noqa: F401
    EtlReport,
    SequenceExtract,
    extract_sequence,
    write_npz,
    write_reference_layout,
)
from av1tpu.ingest.xlsx import (  # noqa: F401
    export_dump_dir_to_xlsx,
    parse_xlsx_directory,
    parse_xlsx_file,
    read_frame_xlsx,
    write_frame_xlsx,
)
