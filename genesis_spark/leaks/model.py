"""Card extraction model: the validated record a leak parser emits.

Mirrors ``card_extraction_model`` (card_extraction_model.py:7-45): same
field set, same required-field validation, same network/content-type
vocabulary checks — expressed as a plain dict factory + a Spark schema so
cards are Arrow-serializable rows instead of pydantic objects.
"""

from __future__ import annotations

from pyspark.sql import types as T

from genesis_spark import conf

# required and non-None (card_extraction_model.py:31-36)
_REQUIRED = ("m_title", "m_url", "m_content", "m_base_url",
             "m_important_content")

_STR_FIELDS = ("m_title", "m_url", "m_base_url", "m_content",
               "m_important_content", "m_network", "m_name")
_LIST_FIELDS = ("m_content_type", "m_weblink", "m_dumplink",
                "m_email_addresses", "m_phone_numbers", "m_addresses",
                "m_social_media_profiles", "m_websites",
                "m_logo_or_images")
_OPT_FIELDS = ("m_company_name", "m_leak_date", "m_data_size",
               "m_country_name", "m_industry", "m_revenue")

CARD_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), f not in _REQUIRED)
     for f in _STR_FIELDS] +
    [T.StructField(f, T.ArrayType(T.StringType()), True)
     for f in _LIST_FIELDS] +
    [T.StructField(f, T.StringType(), True) for f in _OPT_FIELDS])


def make_card(**kw) -> dict:
    """Build a validated card dict (card_extraction_model.__post_init__):
    required fields non-None, m_network in the 4-value vocabulary,
    m_content_type a subset of the 32-type vocabulary. Raises ValueError
    exactly where the reference model does."""
    card = {f: kw.get(f, "") for f in _STR_FIELDS}
    card.update({f: list(kw.get(f) or []) for f in _LIST_FIELDS})
    card.update({f: kw.get(f) for f in _OPT_FIELDS})
    for f in _REQUIRED:
        if card[f] is None:
            raise ValueError(f"The field '{f}' is required and cannot be "
                             f"None.")
    if card["m_network"] not in conf.VALID_NETWORK_TYPES:
        raise ValueError(f"Invalid network type: {card['m_network']}")
    if not all(c in conf.VALID_CONTENT_TYPES for c in card["m_content_type"]):
        raise ValueError(f"Invalid content type(s): {card['m_content_type']}")
    return card
