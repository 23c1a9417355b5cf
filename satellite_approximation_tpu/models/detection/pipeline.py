"""The full detection pipeline: detect / detect_clouds / detect_in_folder.

Rebuild of lib/cloud_shadow_detection/source/automatic_detection.cpp. Where
the reference lazily spins up an OpenCL context and compiles kernels
(automatic_detection.cpp:87-89), the TPU path needs no explicit device
management — XLA owns placement and compilation caching.
"""

from __future__ import annotations

import dataclasses
import threading
from pathlib import Path

import numpy as np

from ...config import DetectionConfig, DEFAULT_DETECTION
from ...ops import geometry
from ...utils.dates import Date
from ...utils.db import DataBase
from ...utils.filesystem import multispectral_folders
from ...utils.geotiff import GeoTIFF, write_geotiff
from ...utils.log import create_logger
from ...utils.perf import Stopwatch
from ...utils.types import percent_non_zero
from . import cloud_mask as cm
from . import shadow_mask as sm
from . import matching, refinement

_logger = create_logger("detection.pipeline")

_overlap_executor = None


_overlap_lock = threading.Lock()


def _get_overlap_executor():
    """Shared 3-worker pool for overlapping independent big-scene stages
    (angle upload rides the link, cloud partition rides the host CPU, mask
    TIFF writes ride disk + link — disjoint resources, no data deps)."""
    global _overlap_executor
    with _overlap_lock:
        if _overlap_executor is None:
            from concurrent.futures import ThreadPoolExecutor

            _overlap_executor = ThreadPoolExecutor(
                max_workers=3, thread_name_prefix="sat-overlap"
            )
    return _overlap_executor


@dataclasses.dataclass
class CloudParams:
    """Input/output path conventions for one date folder
    (automatic_detection.cpp:40-71)."""

    nir_path: Path = Path()
    clp_path: Path = Path()
    cld_path: Path = Path()
    scl_path: Path = Path()
    rgb_path: Path = Path()
    view_zenith_path: Path = Path()
    view_azimuth_path: Path = Path()
    sun_zenith_path: Path = Path()
    sun_azimuth_path: Path = Path()

    @classmethod
    def from_root(cls, root: Path | str) -> "CloudParams":
        root = Path(root)
        return cls(
            nir_path=root / "B08.tif",
            clp_path=root / "CLP.tif",
            cld_path=root / "CLD.tif",
            scl_path=root / "SCL.tif",
            rgb_path=root / "RGB.tif",
            view_zenith_path=root / "viewZenithMean.tif",
            view_azimuth_path=root / "viewAzimuthMean.tif",
            sun_zenith_path=root / "sunZenithAngles.tif",
            sun_azimuth_path=root / "sunAzimuthAngles.tif",
        )

    def cloud_path(self) -> Path:
        return self.nir_path.parent / "cloud_mask.tif"

    def shadow_potential_path(self) -> Path:
        return self.nir_path.parent / "potential_shadows.tif"

    def object_based_shadow_path(self) -> Path:
        return self.nir_path.parent / "object_based_shadows.tif"

    def shadow_path(self) -> Path:
        return self.nir_path.parent / "shadow_mask.tif"


@dataclasses.dataclass
class SkipShadowDetection:
    """Skip the slow shadow stage when cloud cover is above ``threshold``
    (automatic_detection.h SkipShadowDetection)."""

    decision: bool = False
    threshold: float = 0.0

    def __repr__(self) -> str:
        return f"<SkipShadowDetection: {self.decision} (threshold: {self.threshold})>"


@dataclasses.dataclass
class Status:
    """Per-date detection result persisted to the DB
    (cloud_shadow_detection/db.h Status)."""

    percent_clouds: float = 0.0
    percent_shadows: float | None = None
    percent_invalid: float = 0.0
    clouds_computed: bool = False
    shadows_computed: bool = False


def get_diagonal_distance(
    min_long: float, min_lat: float, max_long: float, max_lat: float
) -> float:
    """Geodetic diagonal of the scene bbox in km (automatic_detection.cpp:73-78)."""
    return geometry.haversine_distance((min_long, min_lat), (max_long, max_lat))


def _read_normalized_u8(path: Path, max_value: float, inputs: dict[str, np.ndarray] | None = None):
    """Decode an integer raster and normalize to [0, 1] f32 ON DEVICE.

    The raw u8/u16 bytes upload as-is (2-4x less H2D than host-normalized
    f32 — H2D rides a slow tunnel on networked-TPU hosts); normalization
    divides in f64 on device and casts to f32. TPU f32 division is NOT
    correctly rounded (measured: 1-ulp misrounds, enough to flip e.g. the
    CLD==20 pixel across the 0.2 threshold), but f64-divide-then-cast is
    bit-identical to the host numpy f32 division for EVERY representable
    u8/u16 value and all three divisors — verified exhaustively on TPU and
    in tests/test_pipeline_e2e.py::TestDeviceNormalize. (A host-exact
    lookup table would also be exact, but XLA lowers the gather to a ~62 GB
    broadcast-select at full-tile scale.)"""
    import jax.numpy as jnp

    raw = inputs.get(path.stem) if inputs else None
    if raw is None:
        raw = GeoTIFF.open(path).read()
    if raw.dtype in (np.uint8, np.uint16):
        raw_j = jnp.asarray(raw)
        return (raw_j.astype(jnp.float64) / jnp.float64(max_value)).astype(jnp.float32)
    return jnp.asarray(raw.astype(np.float32) / np.float32(max_value))


def _read_angles(
    path: Path,
    what: str,
    inputs: dict[str, np.ndarray] | None = None,
    dtype=np.float64,
) -> np.ndarray:
    """``dtype``: f64 for the host LS path; the device branch passes f32 —
    its reduction casts to f32 anyway, and the f64 upcast would cost ~1 GB
    of host RAM per full-tile raster."""
    raw = inputs.get(path.stem) if inputs else None
    if raw is not None:
        # zero-copy when the caller's raster already has the target dtype
        # (a full-tile f32 raster is ~482 MB; four needless copies measured
        # as multi-minute stalls on a contended 1-core host)
        return np.asarray(raw, dtype)
    try:
        return np.asarray(GeoTIFF.open(path).read(), dtype)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(f"Failed to open {what} file. Provided path: {path}") from e


def _write_mask(mask: np.ndarray, out_path: Path, template: Path) -> None:
    from ...ops.masks import fetch_mask

    # device masks come home bit-packed (1 bit/px over the link)
    write_geotiff(fetch_mask(mask).astype(np.uint8), out_path, template_path=template)


def _resolve_detect_mesh(mesh):
    """detect()'s mesh policy: "auto" -> one flat mesh over every visible
    device when more than one exists (None on single-device hosts); None ->
    single-device; an explicit jax.sharding.Mesh is used as-is."""
    if mesh is None:
        return None
    from jax.sharding import Mesh

    if isinstance(mesh, Mesh):
        return mesh
    if mesh == "auto":
        import jax

        n = len(jax.devices())
        if n <= 1:
            return None
        return jax.make_mesh((n,), ("d",))
    raise ValueError(f"unknown mesh setting {mesh!r}")


def detect(
    params: CloudParams,
    diagonal_distance: float,
    skip_shadow_detection: SkipShadowDetection = SkipShadowDetection(),
    use_cache: bool = True,
    config: DetectionConfig = DEFAULT_DETECTION,
    timer: "StageTimer | None" = None,
    inputs: dict[str, np.ndarray] | None = None,
    mesh="auto",
) -> Status | None:
    """Run the full cloud + shadow detection for one date folder
    (automatic_detection.cpp:80-236). Returns None when cached outputs exist.

    ``timer``: optional StageTimer accumulating per-stage wall times (the
    reference's spdlog stopwatches, automatic_detection.cpp:263-323).

    ``inputs``: optional pre-decoded rasters keyed by file stem ("B08",
    "CLP", ..., "sunZenithAngles"); rasters present here skip the disk read.
    `detect_in_folder` uses this to overlap TIFF decode of the next dates
    with the current date's compute (the reference decodes every raster on
    the critical path, automatic_detection.cpp:286-324).

    ``mesh``: multi-device routing for the device-stage route. "auto"
    (default) shards over every visible device when more than one exists —
    the matching height sweep, alpha/beta maps, probability histograms, and
    final-mask sampling run via :mod:`parallel.detect` (bit-equal to the
    single-device stages by construction); pass None to pin single-device
    or an explicit ``jax.sharding.Mesh`` to control the layout. Only the
    device-stage route shards (host-native stages have their own
    parallelism); single-device hosts are unaffected.
    """
    if use_cache and params.cloud_path().exists() and params.shadow_path().exists():
        _logger.debug(
            "Skipping %s because both the clouds and the shadows have been computed",
            params.cloud_path().parent,
        )
        return None

    if timer is None:
        from ...utils.profiling import StageTimer

        timer = StageTimer()
    status = Status()

    with timer.stage("read inputs"):
        clp = _read_normalized_u8(params.clp_path, 255, inputs)
        cld = _read_normalized_u8(params.cld_path, 100, inputs)
        scl_host = (
            inputs[params.scl_path.stem]
            if inputs and params.scl_path.stem in inputs
            else GeoTIFF.open(params.scl_path).read()
        )
        import jax.numpy as jnp

        scl = jnp.asarray(scl_host)  # upload u8 once; both kernels reuse it
        from ...config import BIG_SCENE_PIXELS
        from ... import native

        big_scene = clp.size >= BIG_SCENE_PIXELS
        # Stage placement for big scenes. backend="jax" forces every stage
        # on device. "auto" on a real TPU routes the shadow stage and the
        # refinement on device too — measured at full tile (results_r03
        # config 6 stage tables, even across a ~25 MB/s tunnel): pit fill
        # 23 s device vs 608 s host priority-flood, alpha ~0 vs 143 s,
        # beta 28 vs 208 s, sun/view LS 95 vs 777 s. Ray-cast matching has
        # its own size-based routing (matching.match_clouds_shadows): the
        # shift-decomposed device sweep beats the native scan ~50x at big
        # scenes since it no longer gathers. Without a TPU (CPU jax), host
        # native stages win and the old routing stands.
        import jax

        device_stages = config.refinement.backend == "jax" or (
            config.refinement.backend == "auto"
            and big_scene
            and jax.default_backend() == "tpu"
        )
        # multi-device mesh for the device-stage route (SURVEY §2.5 P6 on
        # the detection pipeline; reference is one OpenCL device,
        # ComputeEnvironment.cpp:9-14). None on single-device hosts.
        det_mesh = _resolve_detect_mesh(mesh) if device_stages else None
        host_shadow = big_scene and not device_stages and native.available()
        if host_shadow:
            # host f32 division of u16 values equals the device
            # normalization bit-for-bit (TestDeviceNormalize)
            raw = inputs.get(params.nir_path.stem) if inputs else None
            if raw is None:
                raw = GeoTIFF.open(params.nir_path).read()
            nir = raw.astype(np.float32) / np.float32(np.iinfo(np.uint16).max)
        else:
            nir = _read_normalized_u8(params.nir_path, np.iinfo(np.uint16).max, inputs)
    shape = clp.shape

    _logger.debug(" --- Cloud Detection...")
    all_device = device_stages

    # Big-scene device route: the sun/view angle rasters are consumed only
    # by the LS geometry stage, but their H2D upload is the single largest
    # link cost of the pipeline (~1 GB u16-quantized at full tile). Start
    # the read+upload on a worker NOW so it hides behind the cloud/shadow
    # device stages; results are the same device arrays the serial path
    # would build, so numerics are bit-identical. Cost: the four full-tile
    # angle rasters (~2 GB f32 at 10980^2) sit in HBM through the
    # cloud/shadow/PSM stages instead of only during the geometry stage —
    # acceptable on a 16 GB chip next to those stages' ~3 GB peak, and the
    # arrays are freed right after the LS reduction consumes them.
    overlap = all_device and big_scene
    angles_fut = None

    def _upload_angles_task():
        with timer.stage("angle upload (overlapped)"):
            out = []
            for apath, what in (
                (params.sun_zenith_path, "Sun Zenith"),
                (params.sun_azimuth_path, "Sun Azimuth"),
                (params.view_zenith_path, "View Zenith"),
                (params.view_azimuth_path, "View Azimuth"),
            ):
                raw = _read_angles(apath, what, inputs, np.float32)
                out.append(geometry.upload_angles(raw))
            for arr in out:
                arr.block_until_ready()
            return out

    if overlap and not skip_shadow_detection.decision:
        angles_fut = _get_overlap_executor().submit(_upload_angles_task)

    with timer.stage("cloud mask"):
        generated = cm.generate_cloud_mask_ignore_low_probability(
            clp, cld, scl, config.cloud_mask, device_output=all_device
        )
        status.clouds_computed = True
        status.percent_clouds = percent_non_zero(generated.cloud_mask)
        status.percent_invalid = status.percent_clouds

    # In the overlapped schedule mask writes (packed D2H fetch + TIFF
    # encode) run on workers and hide behind later stages; every write is
    # joined before detect returns, so the on-disk cache contract holds.
    pending_writes = []

    def _submit_write(arr, out_path, stage_name):
        def task():
            with timer.stage(stage_name):
                _write_mask(arr, out_path, params.nir_path)

        if overlap:
            pending_writes.append(_get_overlap_executor().submit(task))
        else:
            task()

    try:
        _submit_write(generated.cloud_mask, params.cloud_path(), "write cloud mask")

        if skip_shadow_detection.decision:
            if status.percent_clouds >= skip_shadow_detection.threshold:
                _logger.debug(
                    "Skipping %s because too much of the image is clouds (%.2f%% clouds)",
                    params.cloud_path().parent,
                    status.percent_clouds * 100,
                )
                for fut in pending_writes:
                    fut.result()
                return status

        if overlap and angles_fut is None:
            # skip_shadow_detection was armed, so the upload waited for the
            # cloud-cover verdict; it still overlaps partition + shadow mask
            angles_fut = _get_overlap_executor().submit(_upload_angles_task)

        _logger.debug(" --- Cloud Partitioning...")

        def _partition_task():
            with timer.stage("cloud partition"):
                return cm.partition_cloud_mask(
                    generated.cloud_mask_no_processing,
                    diagonal_distance,
                    config.min_cloud_size_for_ray_casting,
                )

        if overlap:
            # host-CPU flood runs on a worker while the device computes the
            # shadow mask; joined right after (matching needs both)
            partition_fut = _get_overlap_executor().submit(_partition_task)
        else:
            cloud_map, clouds = _partition_task()

        _logger.debug(" --- Potential Shadow Mask Generation...")
        with timer.stage("potential shadow mask"):
            psm = sm.generate_potential_shadow_mask(
                nir,
                generated.cloud_mask_no_processing,
                scl_host if host_shadow else scl,
                config.shadow_mask,
                device_output=all_device,
            )

        # potential-shadow mask is final as soon as the stage ends — its write
        # hides behind the geometry/matching/refinement stages
        _submit_write(psm.mask, params.shadow_potential_path(), "write shadow masks")

        if overlap:
            with timer.stage("cloud partition (wait)"):
                cloud_map, clouds = partition_fut.result()

        angle_dtype = np.float32  # the LS reduction uses f32 directions
        with timer.stage("read angles"):
            if angles_fut is not None:
                sun_zenith, sun_azimuth, view_zenith, view_azimuth = angles_fut.result()
            else:
                sun_zenith = _read_angles(params.sun_zenith_path, "Sun Zenith", inputs, angle_dtype)
                sun_azimuth = _read_angles(params.sun_azimuth_path, "Sun Azimuth", inputs, angle_dtype)
                view_zenith = _read_angles(params.view_zenith_path, "View Zenith", inputs, angle_dtype)
                view_azimuth = _read_angles(params.view_azimuth_path, "View Azimuth", inputs, angle_dtype)

        _logger.debug(" --- Solving for Sun and Satellite Position...")
        with timer.stage("sun/view geometry"):
            # two equivalent f32-direction reductions (~1e-7 relative
            # agreement, far inside the 25 m height quantization of the
            # downstream sweep). Host chunked numpy by default: no device
            # transfers, the right call when the accelerator link is slow.
            # All-device mode uses the device reduction — the full-tile host
            # loop is ~13 s/Mpix-row of single-core trig (measured 765 s at
            # 10980^2) vs one upload + a bandwidth-bound device pass.
            ls_point = (
                geometry.ls_point_equal_to_device
                if all_device
                else geometry.ls_point_equal_to_chunked
            )
            sun_pos = ls_point(
                sun_zenith, sun_azimuth, shape, diagonal_distance,
                config.distance_to_sun_km,
            )
            view_pos = ls_point(
                view_zenith, view_azimuth, shape, diagonal_distance,
                config.distance_to_view_km,
            )
            # The overlapped early upload keeps four full-tile f32 rasters
            # (~2 GB at 10980^2) resident through the cloud/shadow stages —
            # the price of hiding their H2D behind device compute. Drop the
            # references as soon as the LS reductions consume them so XLA
            # can free the HBM before matching/refinement peak.
            del sun_zenith, sun_azimuth, view_zenith, view_azimuth

        _logger.debug(" --- Object-based Shadow Mask Generation...")
        with timer.stage("cloud-shadow matching"):
            # with a mesh, the similarity sweep shards its height axis over
            # every device (bit-equal per (height, cloud) cell; forces the
            # device sweep) — all other matching orchestration is shared
            sweep_fn = None
            if det_mesh is not None:
                from ...parallel import detect as parallel_detect

                sweep_fn = parallel_detect.sharded_sweep(det_mesh)
            match = matching.match_clouds_shadows(
                clouds,
                cloud_map,
                generated.cloud_mask_no_processing,
                psm.mask,
                diagonal_distance,
                sun_pos,
                view_pos,
                config.matching,
                timer=timer,
                sweep_fn=sweep_fn,
            )

        # object-based shadow mask is final after matching — write it while
        # the refinement stages compute
        _submit_write(
            match.shadow_mask, params.object_based_shadow_path(), "write shadow masks"
        )

        _logger.debug(" --- Generating Probability Function...")
        # device_stages (backend="jax", or "auto" on a TPU at full-tile scale):
        # alpha / beta / histograms / sampling all run on device — beta's
        # inputs (blended CLP, shadow windows) are already device-resident
        # there, and the bucketed device beta measured 28 s vs 208 s host at
        # full tile. Otherwise "auto" follows the data: device refinement only
        # when the shadow stage left device arrays, and beta stays host
        # (per-shadow EDT windows are cheap on host at small scales).
        backend = config.refinement.backend
        use_jax_refinement = device_stages
        dev_refine = use_jax_refinement or (
            backend == "auto"
            and not isinstance(psm.difference_of_pitfill_nir, np.ndarray)
        )
        if dev_refine:
            from . import refinement_jax
        if det_mesh is not None:
            from ...parallel import detect as parallel_detect
        alpha_rows = None
        with timer.stage("alpha map"):
            if det_mesh is not None:
                # row-sharded over the mesh (parallel/detect): per-device
                # raster residency shrinks 1/n_devices for this stage. The
                # raster stays row-PADDED (+ alpha_rows) so the downstream
                # sharded stages chain without any replicate/slice.
                alpha, alpha_rows = parallel_detect.sharded_alpha_map(
                    psm.difference_of_pitfill_nir, det_mesh,
                    config.refinement.alpha_a, config.refinement.alpha_b,
                    padded_output=True,
                )
            elif dev_refine:
                # stays a device array: its only consumers are device programs
                alpha = refinement_jax.alpha_map_jax(
                    psm.difference_of_pitfill_nir,
                    config.refinement.alpha_a,
                    config.refinement.alpha_b,
                )
            else:
                alpha = refinement.alpha_map(psm.difference_of_pitfill_nir, config.refinement)
        with timer.stage("beta map"):
            if det_mesh is not None:
                # shadow-axis sharded, exact pmax merge (parallel/detect)
                beta = parallel_detect.sharded_beta_map(
                    match.shadows,
                    match.solutions,
                    generated.blended_cloud_probability,
                    diagonal_distance,
                    det_mesh,
                    config.refinement,
                    device_output=True,
                )
            elif use_jax_refinement:
                # device_output: beta's only consumers (histogram scatter-adds,
                # final-mask sampling) are device programs — never round-trip
                # the ~482 MB full-tile f32 raster over the link
                beta = refinement_jax.beta_map_jax(
                    match.shadows,
                    match.solutions,
                    generated.blended_cloud_probability,
                    diagonal_distance,
                    config.refinement,
                    device_output=True,
                )
            else:
                beta = refinement.beta_map(
                    match.shadows,
                    match.solutions,
                    generated.blended_cloud_probability,
                    diagonal_distance,
                    config.refinement,
                )
                if dev_refine:
                    import jax.numpy as jnp

                    beta = jnp.asarray(beta)  # upload once; surface + sampling reuse
        with timer.stage("probability surface"):
            if det_mesh is not None:
                # row-sharded scatter-adds + exact int32 psum merges
                surface = parallel_detect.sharded_probability_map(
                    match.shadow_mask, alpha, beta, det_mesh, config.refinement,
                    rows=alpha_rows,
                )
            elif dev_refine:
                surface = refinement_jax.probability_map_jax(
                    match.shadow_mask, alpha, beta, config.refinement
                )
            else:
                surface = refinement.probability_map(
                    match.shadow_mask, alpha, beta, config.refinement
                )

        _logger.debug(" --- Final Shadow Mask Generation...")
        with timer.stage("final mask"):
            if det_mesh is not None:
                final = parallel_detect.sharded_improved_shadow_mask(
                    match.shadow_mask,
                    generated.cloud_mask,
                    alpha,
                    beta,
                    surface,
                    config.probability_threshold,
                    det_mesh,
                    device_output=all_device,
                    rows=alpha_rows,
                )
            elif dev_refine:
                # device_output: the percent reductions, the OR with the device
                # cloud mask, and the packed TIFF write all consume it in HBM
                final = refinement_jax.improved_shadow_mask_jax(
                    match.shadow_mask,
                    generated.cloud_mask,
                    alpha,
                    beta,
                    surface,
                    config.probability_threshold,
                    device_output=all_device,
                )
            else:
                final = refinement.improved_shadow_mask(
                    match.shadow_mask,
                    generated.cloud_mask,
                    alpha,
                    beta,
                    surface,
                    config.probability_threshold,
                )
        _logger.debug("...Finished Algorithm.")

        status.shadows_computed = True
        status.percent_shadows = percent_non_zero(final)
        total_mask = generated.cloud_mask | final
        status.percent_invalid = percent_non_zero(total_mask)

        _logger.debug("Saving shadow results")
        _submit_write(final, params.shadow_path(), "write shadow masks")
        with timer.stage("write shadow masks (wait)"):
            for fut in pending_writes:
                fut.result()
        return status
    finally:
        # Error paths must not leak orphaned writer threads racing the
        # output files (a caller that catches and retries would collide
        # with them, and their failures would vanish). On success every
        # future was already joined (and raised) above, so this drain is
        # free; on an exception it blocks until writers finish and logs
        # their failures instead of dropping them.
        for fut in pending_writes:
            try:
                fut.result()
            except Exception:
                _logger.exception("background mask write failed")


def detect_clouds(folder: Path | str, db: DataBase, config: DetectionConfig = DEFAULT_DETECTION) -> Status:
    """Cloud-only variant (automatic_detection.cpp:238-258)."""
    folder = Path(folder)
    clp = _read_normalized_u8(folder / "CLP.tif", 255)
    cld = _read_normalized_u8(folder / "CLD.tif", 100)
    scl = GeoTIFF.open(folder / "SCL.tif").read()

    generated = cm.generate_cloud_mask_ignore_low_probability(clp, cld, scl, config.cloud_mask)
    status = Status(
        clouds_computed=True,
        percent_clouds=percent_non_zero(generated.cloud_mask),
    )
    status.percent_invalid = status.percent_clouds
    _write_mask(generated.cloud_mask, folder / "cloud_mask.tif", folder / "B08.tif")
    db.write_detection_result(Date.from_string(folder.name), status)
    return status


def detect_single_folder(
    directory: Path | str,
    diagonal_distance: float,
    skip_shadow_detection: SkipShadowDetection = SkipShadowDetection(),
    use_cache: bool = True,
    config: DetectionConfig = DEFAULT_DETECTION,
) -> Status | None:
    """Detect one date folder and persist the Status to the parent's DB
    (automatic_detection.cpp:260-284)."""
    directory = Path(directory)
    _logger.debug("Starting calculation")
    sw = Stopwatch()
    params = CloudParams.from_root(directory)
    status = detect(params, diagonal_distance, skip_shadow_detection, use_cache, config)
    db = DataBase(directory.parent)
    if status is not None:
        db.write_detection_result(Date.from_string(directory.name), status)
    db.close()
    _logger.debug("Finished in %.2f s", sw.elapsed())
    return status


def detect_in_folder(
    folder_path: Path | str,
    diagonal_distance: float,
    skip_shadow_detection: SkipShadowDetection = SkipShadowDetection(),
    use_cache: bool = True,
    config: DetectionConfig = DEFAULT_DETECTION,
) -> dict[Date, Status]:
    """Detect every multispectral date folder under ``folder_path``
    (automatic_detection.cpp:286-324).

    Unlike the reference, which decodes every raster sequentially on the
    critical path, a background thread pool decodes the next dates' TIFFs
    while the current date computes (FolderPrefetcher; PIL's zlib decode
    releases the GIL, so decode overlaps both device compute and the
    host-side pipeline stages)."""
    folder_path = Path(folder_path)
    results: dict[Date, Status] = {}
    _logger.debug("Starting calculation")
    sw = Stopwatch()
    folders = multispectral_folders(folder_path)
    if use_cache:
        # Don't burn decode threads on dates detect() would short-circuit.
        pending = [
            d
            for d in folders
            if not (
                CloudParams.from_root(d).cloud_path().exists()
                and CloudParams.from_root(d).shadow_path().exists()
            )
        ]
    else:
        pending = folders
    from ...utils.loader import FolderPrefetcher

    for directory, inputs in FolderPrefetcher(folders=pending):
        _logger.info("Calculating for %s", directory.name)
        params = CloudParams.from_root(directory)
        status = detect(
            params, diagonal_distance, skip_shadow_detection, use_cache, config,
            inputs=inputs,
        )
        if status is not None:
            results[Date.from_string(directory.name)] = status
    db = DataBase(folder_path)
    db.write_detection_results(results)
    db.close()
    _logger.info("Finished computing")
    _logger.debug("Finished in %.2f s", sw.elapsed())
    return results


def get_detection_results(base_folder: Path | str) -> dict[Date, Status]:
    """Recompute Status rows by reading mask TIFFs from disk
    (cloud_shadow_detection/db.cpp:87-142)."""
    base_folder = Path(base_folder)
    results: dict[Date, Status] = {}
    for folder in multispectral_folders(base_folder):
        status = Status()
        cloud_values = shadow_values = None
        if (folder / "cloud_mask.tif").exists():
            try:
                cloud_values = GeoTIFF.open(folder / "cloud_mask.tif").read()
                status.clouds_computed = True
            except Exception as e:  # noqa: BLE001
                _logger.error("Failed to open cloud file: %s", e)
        if (folder / "shadow_mask.tif").exists():
            try:
                shadow_values = GeoTIFF.open(folder / "shadow_mask.tif").read()
                status.shadows_computed = True
            except Exception as e:  # noqa: BLE001
                _logger.warning("Failed to open shadow file: %s", e)
        if not (status.clouds_computed or status.shadows_computed):
            _logger.warning("Could not find mask data. Skipping dir: %s", folder)
            continue
        if shadow_values is None:
            shadow_values = np.zeros_like(cloud_values)
        if cloud_values is None:
            cloud_values = np.zeros_like(shadow_values)
        mask = cloud_values.astype(bool) | shadow_values.astype(bool)
        status.percent_clouds = percent_non_zero(cloud_values)
        if status.shadows_computed:
            status.percent_shadows = percent_non_zero(shadow_values)
        status.percent_invalid = percent_non_zero(mask)
        results[Date.from_string(folder.name)] = status
    return results
