"""Plausibility validators (reference parity: the per-record
``validate_*_analysis`` checks each analyzer runs before persisting —
``forest_analyzer_v3.py:590-623``, ``vegetation_analyzer_v3.py:233-273``,
``crop_analyzer_v3.py:437-476``, ``landcover_analyzer_v3.py:566-603``).

The reference walks Python dicts row-by-row; here each validator is a
pure COLUMN expression emitting the same warning/error strings into
``array<string>`` columns (``F.filter`` drops the un-fired ``when``
branches), so validation rides whole-stage codegen over any number of
rows — no UDF, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fired(*branches: Column) -> Column:
    """array of the branch messages that fired (nulls filtered)."""
    return F.filter(F.array(*branches), lambda x: x.isNotNull())


def forest_validation(
    biomass_tpa: Column, confidence: Column, area_acres: Column,
) -> Column:
    """struct(valid, warnings) — forest_analyzer_v3.py:590-623: warn on
    biomass density < 10 or > 200 tons/acre, confidence < 0.5, area
    < 0.1 acres; the forest checks only WARN (valid stays true)."""
    warnings = _fired(
        F.when(biomass_tpa < 10.0, F.format_string(
            "Low biomass density: %.1f tons/acre", biomass_tpa)),
        F.when(biomass_tpa > 200.0, F.format_string(
            "High biomass density: %.1f tons/acre", biomass_tpa)),
        F.when(confidence < 0.5, F.format_string(
            "Low confidence score: %.2f", confidence)),
        F.when(area_acres < 0.1, F.format_string(
            "Very small forest area: %.3f acres", area_acres)),
    )
    return F.struct(F.lit(True).alias("valid"), warnings.alias("warnings"))


def vegetation_validation(ndvi: Column, pixel_count: Column) -> Column:
    """struct(valid, errors, warnings) — vegetation_analyzer_v3.py:233-273:
    NDVI outside [-1, 1] or missing is an ERROR (valid=false); NDVI < -0.5
    and pixel_count < 10 are warnings."""
    errors = _fired(
        F.when(ndvi.isNull(), F.lit("NDVI could not be calculated")),
        F.when(ndvi.isNotNull() & ~ndvi.between(-1.0, 1.0),
               F.format_string("NDVI %.3f outside valid range", ndvi)),
    )
    warnings = _fired(
        F.when(ndvi.isNotNull() & ndvi.between(-1.0, 1.0) & (ndvi < -0.5),
               F.format_string(
                   "Very low NDVI %.3f - may indicate water or bare soil",
                   ndvi)),
        F.when(pixel_count < 10, F.format_string(
            "Low pixel count %d - may affect accuracy",
            pixel_count.cast("long"))),
    )
    return F.struct(
        (F.size(errors) == 0).alias("valid"),
        errors.alias("errors"),
        warnings.alias("warnings"),
    )


def crop_coverage_validation(total_coverage_pct: Column,
                             n_low_confidence: Column) -> Column:
    """struct(valid, warnings) over PER-PARCEL aggregates —
    crop_analyzer_v3.py:437-476: total coverage above 105% (5% overlap
    tolerance) and any low-confidence crops warn."""
    warnings = _fired(
        F.when(total_coverage_pct > 105.0, F.format_string(
            "Total crop coverage %.1f%% exceeds 100%%", total_coverage_pct)),
        F.when(n_low_confidence > 0, F.format_string(
            "%d crops with low confidence scores",
            n_low_confidence.cast("long"))),
    )
    return F.struct(F.lit(True).alias("valid"), warnings.alias("warnings"))


def landcover_validation(data_completeness: Column,
                         total_percentage: Column) -> Column:
    """struct(valid, warnings) — landcover_analyzer_v3.py:566-603:
    completeness < 0.8 and percentage sum off 100 by > 5 warn."""
    warnings = _fired(
        F.when(data_completeness < 0.8, F.format_string(
            "Low data completeness: %.2f%%", data_completeness * 100.0)),
        F.when(F.abs(total_percentage - 100.0) > 5.0, F.format_string(
            "Land cover percentages sum to %.1f%% (expected ~100%%)",
            total_percentage)),
    )
    return F.struct(F.lit(True).alias("valid"), warnings.alias("warnings"))
