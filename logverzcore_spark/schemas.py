"""DataType schema registry — the reference's SSM-parameter registry
re-expressed as Python data.

The reference stores one JSON document per DataType under
``/Logverz/Engine/Schemas/<DataType>`` with a Sequelize column list, S3
Select-shaped read options (``StgSelectParameters.IO.InputSerialization``),
and named projection Views (Logverz-Engine.json:1606-1770;
jobproducer.js:173-183 fetches it per job; SURVEY §1.1). Here each entry
carries a Spark ``StructType``, reader format+options, an optional JSON
root element to unnest, and the Views.

A "Custom" DataType (ad-hoc schema string submitted with the job —
jobproducer.js:191-197) is supported via :func:`parse_custom_schema`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_ALIASES = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "json": T.StringType(),  # JSON columns kept as raw string twin; see Views
}


@dataclass
class DataType:
    """One registry entry: how to read files of this type and what schema
    the resulting table has."""

    name: str
    schema: T.StructType
    format: str = "csv"  # csv | json | binary-zip
    options: dict[str, str] = field(default_factory=dict)
    root_element: str | None = None  # JSON array to explode (CloudTrail "Records")
    views: dict[str, list[str]] = field(default_factory=dict)
    comment_prefix: str | None = None  # preamble lines to drop (CloudFront '#')
    #: Known nested shapes for JSON-string columns. The stored table keeps
    #: the raw string twin (reference parity for ->>-style queries);
    #: ``typed_json_view`` adds real struct columns — strictly better for
    #: Catalyst (field pruning, no per-row JSON parse at query time).
    json_structs: dict[str, T.StructType] = field(default_factory=dict)


def typed_json_view(df, dt: "DataType"):
    """Return ``df`` with each known JSON-string column parsed into a
    typed struct column ``<name>_struct`` (original string kept for the
    reference's ->> query corpus). One narrow projection; downstream
    struct-path reads are pruned column accesses, not JSON parses."""
    from pyspark.sql import functions as F

    out = df
    for col, struct in dt.json_structs.items():
        if col in df.columns:
            out = out.withColumn(f"{col}_struct", F.from_json(F.col(f"`{col}`"), struct))
    return out


def _schema(*cols: tuple[str, str]) -> T.StructType:
    return T.StructType([T.StructField(n, _TYPE_ALIASES[t], True) for n, t in cols])


def parse_custom_schema(text: str) -> T.StructType:
    """Parse an ad-hoc ``name:type, name:type`` schema string (the Custom
    DataType job parameter)."""
    fields = []
    for part in text.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, typ = part.partition(":")
        typ = typ.strip().lower() or "string"
        if typ not in _TYPE_ALIASES:
            raise ValueError(f"unknown type {typ!r} in custom schema")
        fields.append(T.StructField(name.strip(), _TYPE_ALIASES[typ], True))
    if not fields:
        raise ValueError("empty custom schema")
    return T.StructType(fields)


# --------------------------------------------------------------------------
# Built-in DataTypes (FIXTURES.md B1-B7 + CostDemo exports; column lists
# transcribed from the reference registry Logverz-Engine.json:1606-1770)
# --------------------------------------------------------------------------

VPCFLOW = DataType(
    name="VPCFlow",
    format="csv",
    options={"sep": " ", "header": "true"},
    schema=_schema(
        ("version", "int"), ("account-id", "long"), ("interface-id", "string"),
        ("srcaddr", "string"), ("dstaddr", "string"), ("srcport", "int"),
        ("dstport", "int"), ("protocol", "int"), ("packets", "long"),
        ("bytes", "long"), ("start", "long"), ("end", "long"),
        ("action", "string"), ("log-status", "string"), ("vpc-id", "string"),
        ("subnet-id", "string"), ("instance-id", "string"), ("tcp-flags", "string"),
        ("type", "string"), ("pkt-srcaddr", "string"), ("pkt-dstaddr", "string"),
        ("region", "string"), ("az-id", "string"), ("sublocation-type", "string"),
        ("sublocation-id", "string"), ("pkt-src-aws-service", "string"),
        ("pkt-dst-aws-service", "string"), ("flow-direction", "string"),
        ("traffic-path", "int"),
    ),
    views={
        "Default": ["srcaddr", "dstaddr", "srcport", "dstport", "protocol",
                    "packets", "bytes", "action"],
        "Extended": ["version", "account-id", "interface-id", "srcaddr",
                     "dstaddr", "srcport", "dstport", "protocol", "packets",
                     "bytes", "start", "end", "action", "log-status"],
    },
)

CLOUDTRAIL = DataType(
    name="CloudTrail",
    format="json",
    options={"multiLine": "true"},
    root_element="Records",
    schema=_schema(
        ("eventVersion", "float"), ("userIdentity", "json"),
        ("eventTime", "timestamp"), ("eventSource", "string"),
        ("eventName", "string"), ("awsRegion", "string"),
        ("sourceIPAddress", "string"), ("userAgent", "string"),
        ("errorCode", "string"), ("errorMessage", "string"),
        ("requestParameters", "json"), ("responseElements", "json"),
        ("additionalEventData", "json"), ("requestID", "string"),
        ("eventID", "string"), ("eventType", "string"),
        ("recipientAccountId", "string"), ("serviceEventDetails", "json"),
        ("resources", "json"), ("vpcEndpointId", "string"), ("readOnly", "string"),
    ),
    views={
        "Default": ["eventTime", "eventSource", "eventName", "awsRegion",
                    "sourceIPAddress", "errorCode", "errorMessage"],
    },
    json_structs={
        # The corpus queries sessionContext.sessionIssuer.userName
        # (Samplesqlqueries.txt:48-55) — modeled as a real nested struct.
        "userIdentity": T.StructType(
            [
                T.StructField("type", T.StringType()),
                T.StructField("principalId", T.StringType()),
                T.StructField("arn", T.StringType()),
                T.StructField("accountId", T.StringType()),
                T.StructField("invokedBy", T.StringType()),
                T.StructField(
                    "sessionContext",
                    T.StructType(
                        [
                            T.StructField(
                                "sessionIssuer",
                                T.StructType(
                                    [
                                        T.StructField("type", T.StringType()),
                                        T.StructField("userName", T.StringType()),
                                        T.StructField("arn", T.StringType()),
                                    ]
                                ),
                            ),
                        ]
                    ),
                ),
            ]
        ),
    },
)

APPLICATIONLB = DataType(
    name="ApplicationLB",
    format="csv",
    options={"sep": " ", "header": "false", "quote": '"'},
    schema=_schema(
        ("type", "string"), ("timestamp", "timestamp"), ("elb", "string"),
        ("client:port", "string"), ("target:port", "string"),
        ("request_processing_time", "double"), ("target_processing_time", "double"),
        ("response_processing_time", "double"), ("elb_status_code", "int"),
        ("target_status_code", "int"), ("received_bytes", "long"),
        ("sent_bytes", "long"), ("request", "string"), ("user_agent", "string"),
        ("ssl_cipher", "string"), ("ssl_protocol", "string"),
        ("target_group_arn", "string"), ("trace_id", "string"),
        ("domain_name", "string"), ("chosen_cert_arn", "string"),
        ("matched_rule_priority", "int"), ("request_creation_time", "timestamp"),
        ("actions_executed", "string"), ("redirect_url", "string"),
        ("error_reason", "string"), ("target:port_list", "string"),
        ("target_status_code_list", "int"), ("classification", "string"),
        ("classification_reason", "string"),
    ),
    views={
        "Default": ["timestamp", "elb", "client:port", "elb_status_code", "request"],
    },
)

CLASSICLB = DataType(
    name="ClassicLB",
    format="csv",
    options={"sep": " ", "header": "false", "quote": '"'},
    schema=_schema(
        ("timestamp", "string"), ("elb", "string"), ("client:port", "string"),
        ("backend:port", "string"), ("request_processing_time", "double"),
        ("backend_processing_time", "double"), ("response_processing_time", "double"),
        ("elb_status_code", "int"), ("backend_status_code", "int"),
        ("received_bytes", "long"), ("sent_bytes", "long"), ("request", "string"),
        ("user_agent", "string"), ("ssl_cipher", "string"), ("ssl_protocol", "string"),
    ),
)

NETWORKLB = DataType(
    name="NetworkLB",
    format="csv",
    options={"sep": " ", "header": "false", "quote": '"'},
    schema=_schema(
        ("type", "string"), ("version", "string"), ("timestamp", "string"),
        ("elb", "string"), ("listener", "string"), ("client:port", "string"),
        ("destination:port", "string"), ("connection_time", "double"),
        ("tls_handshake_time", "double"), ("received_bytes", "long"),
        ("sent_bytes", "long"), ("incoming_tls_alert", "int"),
        ("chosen_cert_arn", "string"), ("chosen_cert_serial", "string"),
        ("tls_cipher", "string"), ("tls_protocol_version", "string"),
        ("tls_named_group", "string"), ("domain_name", "string"),
        ("alpn_fe_protocol", "string"), ("alpn_be_protocol", "string"),
        ("alpn_client_preference_list", "string"),
    ),
)

CLOUDFRONT = DataType(
    name="CloudFront",
    format="csv",
    options={"sep": "\t", "header": "false"},
    comment_prefix="#",
    schema=_schema(
        ("date", "date"), ("time", "string"), ("x-edge-location", "string"),
        ("sc-bytes", "int"), ("c-ip", "string"), ("cs-method", "string"),
        ("cs(Host)", "string"), ("cs-uri-stem", "string"), ("sc-status", "int"),
        ("cs(Referer)", "string"), ("cs(User-Agent)", "string"),
        ("cs-uri-query", "string"), ("cs(Cookie)", "string"),
        ("x-edge-result-type", "string"), ("x-edge-request-id", "string"),
        ("x-host-header", "string"), ("cs-protocol", "string"), ("cs-bytes", "int"),
        ("time-taken", "double"), ("x-forwarded-for", "string"),
        ("ssl-protocol", "string"), ("ssl-cipher", "string"),
        ("x-edge-response-result-type", "string"), ("cs-protocol-version", "string"),
        ("fle-status", "string"), ("fle-encrypted-fields", "string"),
        ("c-port", "int"), ("time-to-first-byte", "double"),
        ("x-edge-detailed-result-type", "string"), ("sc-content-type", "string"),
        ("sc-content-len", "int"), ("sc-range-start", "string"),
        ("sc-range-end", "string"),
    ),
)

WINDOWSDEMOEVENTS = DataType(
    name="WindowsDemoEvents",
    format="json",
    options={"multiLine": "true"},
    root_element=None,  # top-level array document (JsonType DOCUMENT)
    schema=_schema(
        ("Id", "int"), ("Version", "int"), ("Qualifiers", "string"),
        ("Level", "int"), ("Task", "int"), ("Opcode", "int"),
        ("Keywords", "double"), ("RecordId", "int"), ("ProviderName", "string"),
        ("ProviderId", "string"), ("LogName", "string"), ("ProcessId", "int"),
        ("ThreadId", "int"), ("MachineName", "string"), ("UserId", "json"),
        ("ActivityId", "string"), ("RelatedActivityId", "string"),
        ("ContainerLog", "string"), ("MatchedQueryIds", "json"),
        ("Bookmark", "json"), ("LevelDisplayName", "string"),
        ("OpcodeDisplayName", "string"), ("TaskDisplayName", "string"),
        ("KeywordsDisplayNames", "string"), ("Properties", "json"),
        ("Message", "string"), ("DateTime", "string"),
    ),
)


COSTDEMOAWS = DataType(
    name="CostDemoAWS",
    format="csv",
    options={"sep": ",", "header": "true", "quote": '"'},
    schema=_schema(
        ("identity_line_item_id", "string"), ("identity_time_interval", "string"),
        ("bill_invoice_id", "int"), ("bill_billing_entity", "string"),
        ("bill_bill_type", "string"), ("bill_payer_account_id", "double"),
        ("bill_billing_period_start_date", "string"),
        ("bill_billing_period_end_date", "string"), ("line_item_usage_account_id",
        "double"), ("line_item_line_item_type", "string"),
        ("line_item_usage_start_date", "string"), ("line_item_usage_end_date",
        "string"), ("line_item_product_code", "string"), ("line_item_usage_type",
        "string"), ("line_item_operation", "string"),
        ("line_item_availability_zone", "string"), ("line_item_resource_id",
        "string"), ("line_item_usage_amount", "float"),
        ("line_item_normalization_factor", "float"),
        ("line_item_normalized_usage_amount", "float"), ("line_item_currency_code",
        "string"), ("line_item_unblended_rate", "float"),
        ("line_item_unblended_cost", "float"), ("line_item_blended_rate", "float"),
        ("line_item_blended_cost", "float"), ("line_item_line_item_description",
        "string"), ("line_item_tax_type", "string"), ("line_item_legal_entity",
        "string"), ("product_product_name", "string"), ("product_availability",
        "string"), ("product_capacitystatus", "string"), ("product_category",
        "string"), ("product_clock_speed", "string"), ("product_current_generation",
        "string"), ("product_database_engine", "string"),
        ("product_dedicated_ebs_throughput", "string"),
        ("product_deployment_option", "string"), ("product_description", "string"),
        ("product_durability", "string"), ("product_ecu", "string"),
        ("product_edition", "string"), ("product_engine_code", "string"),
        ("product_enhanced_networking_supported", "string"), ("product_event_type",
        "string"), ("product_free_query_types", "string"), ("product_from_location",
        "string"), ("product_from_location_type", "string"), ("product_group",
        "string"), ("product_group_description", "string"),
        ("product_instance_family", "string"), ("product_instance_type", "string"),
        ("product_instance_type_family", "string"), ("product_license_model",
        "string"), ("product_location", "string"), ("product_location_type",
        "string"), ("product_max_iops_burst_performance", "string"),
        ("product_max_iopsvolume", "int"), ("product_max_throughputvolume",
        "string"), ("product_max_volume_size", "string"), ("product_memory",
        "string"), ("product_message_delivery_frequency", "string"),
        ("product_message_delivery_order", "string"), ("product_min_volume_size",
        "string"), ("product_network_performance", "string"),
        ("product_normalization_size_factor", "float"), ("product_operating_system",
        "string"), ("product_operation", "string"), ("product_physical_processor",
        "string"), ("product_pre_installed_sw", "string"),
        ("product_processor_architecture", "string"), ("product_processor_features",
        "string"), ("product_product_family", "string"), ("product_queue_type",
        "string"), ("product_region", "string"), ("product_servicecode", "string"),
        ("product_servicename", "string"), ("product_sku", "string"),
        ("product_storage", "string"), ("product_storage_class", "string"),
        ("product_storage_media", "string"), ("product_subscription_type",
        "string"), ("product_tenancy", "string"), ("product_to_location", "string"),
        ("product_to_location_type", "string"), ("product_transfer_type", "string"),
        ("product_usagetype", "string"), ("product_vcpu", "int"),
        ("product_version", "string"), ("product_volume_type", "string"),
        ("pricing_lease_contract_length", "string"), ("pricing_offering_class",
        "string"), ("pricing_purchase_option", "string"), ("pricing_rate_id",
        "int"), ("pricing_public_on_demand_cost", "float"),
        ("pricing_public_on_demand_rate", "float"), ("pricing_term", "string"),
        ("pricing_unit", "string"), ("reservation_amortized_upfront_cost_for_usage",
        "int"), ("reservation_amortized_upfront_fee_for_billing_period", "float"),
        ("reservation_effective_cost", "float"), ("reservation_end_time", "string"),
        ("reservation_modification_status", "string"),
        ("reservation_normalized_units_per_reservation", "int"),
        ("reservation_number_of_reservations", "int"),
        ("reservation_recurring_fee_for_usage", "float"),
        ("reservation_reservation_a_r_n", "string"), ("reservation_start_time",
        "string"), ("reservation_subscription_id", "float"),
        ("reservation_total_reserved_normalized_units", "int"),
        ("reservation_total_reserved_units", "int"),
        ("reservation_units_per_reservation", "int"),
        ("reservation_unused_amortized_upfront_fee_for_billing_period", "int"),
        ("reservation_unused_normalized_unit_quantity", "float"),
        ("reservation_unused_quantity", "int"), ("reservation_unused_recurring_fee",
        "float"), ("reservation_upfront_value", "int"),
        ("resource_tags_aws_autoscaling_group_name", "string"),
        ("resource_tags_aws_created_by", "string"),
        ("resource_tags_aws_ec2spot_fleet_request_id", "string"),
        ("resource_tags_user_cost_center", "string"),
        ("resource_tags_user_department", "string"),
        ("resource_tags_user_environment", "string"), ("resource_tags_user_name",
        "string"), ("resource_tags_user_tag21_nov", "string"),
        ("resource_tags_user_workload", "string"),
        ("resource_tags_user_workload_type", "string")
    ),
)

COSTDEMOAZURE = DataType(
    name="CostDemoAzure",
    format="csv",
    options={"sep": ",", "header": "true", "quote": '"'},
    schema=_schema(
        ("BilledCost", "float"), ("BillingAccountId", "string"),
        ("BillingAccountName", "string"), ("BillingAccountType", "string"),
        ("BillingCurrency", "string"), ("BillingPeriodEnd", "string"),
        ("BillingPeriodStart", "string"), ("ChargeCategory", "string"),
        ("ChargeClass", "string"), ("ChargeDescription", "string"),
        ("ChargeFrequency", "string"), ("ChargePeriodEnd", "string"),
        ("ChargePeriodStart", "string"), ("CommitmentDiscountCategory", "string"),
        ("CommitmentDiscountId", "string"), ("CommitmentDiscountName", "string"),
        ("CommitmentDiscountStatus", "string"), ("CommitmentDiscountType",
        "string"), ("ConsumedQuantity", "float"), ("ConsumedUnit", "string"),
        ("ContractedCost", "float"), ("ContractedUnitPrice", "float"),
        ("EffectiveCost", "float"), ("InvoiceIssuerName", "string"), ("ListCost",
        "float"), ("ListUnitPrice", "float"), ("PricingCategory", "string"),
        ("PricingQuantity", "float"), ("PricingUnit", "string"), ("ProviderName",
        "string"), ("PublisherName", "string"), ("RegionId", "string"),
        ("RegionName", "string"), ("ResourceId", "string"), ("ResourceName",
        "string"), ("ResourceType", "string"), ("ServiceCategory", "string"),
        ("ServiceName", "string"), ("SkuId", "int"), ("SkuPriceId", "int"),
        ("SubAccountId", "string"), ("SubAccountName", "string"), ("SubAccountType",
        "string"), ("Tags", "json"), ("x_AccountId", "int"), ("x_AccountName",
        "string"), ("x_AccountOwnerId", "string"), ("x_BilledCostInUsd", "string"),
        ("x_BilledUnitPrice", "float"), ("x_BillingAccountId", "int"),
        ("x_BillingAccountName", "string"), ("x_BillingExchangeRate", "int"),
        ("x_BillingExchangeRateDate", "string"), ("x_BillingProfileId", "int"),
        ("x_BillingProfileName", "string"), ("x_ContractedCostInUsd", "string"),
        ("x_CostAllocationRuleName", "string"), ("x_CostCenter", "string"),
        ("x_CustomerId", "string"), ("x_CustomerName", "string"),
        ("x_EffectiveCostInUsd", "string"), ("x_EffectiveUnitPrice", "float"),
        ("x_InvoiceId", "string"), ("x_InvoiceIssuerId", "float"),
        ("x_InvoiceSectionId", "int"), ("x_InvoiceSectionName", "string"),
        ("x_ListCostInUsd", "string"), ("x_PartnerCreditApplied", "string"),
        ("x_PartnerCreditRate", "string"), ("x_PricingBlockSize", "int"),
        ("x_PricingCurrency", "string"), ("x_PricingSubcategory", "string"),
        ("x_PricingUnitDescription", "string"), ("x_PublisherCategory", "string"),
        ("x_PublisherId", "string"), ("x_ResellerId", "string"), ("x_ResellerName",
        "string"), ("x_ResourceGroupName", "string"), ("x_ResourceType", "string"),
        ("x_ServicePeriodEnd", "string"), ("x_ServicePeriodStart", "string"),
        ("x_SkuDescription", "string"), ("x_SkuDetails", "json"),
        ("x_SkuIsCreditEligible", "boolean"), ("x_SkuMeterCategory", "string"),
        ("x_SkuMeterId", "string"), ("x_SkuMeterName", "string"),
        ("x_SkuMeterSubcategory", "string"), ("x_SkuOfferId", "string"),
        ("x_SkuOrderId", "string"), ("x_SkuOrderName", "string"),
        ("x_SkuPartNumber", "string"), ("x_SkuRegion", "string"),
        ("x_SkuServiceFamily", "string"), ("x_SkuTerm", "int"), ("x_SkuTier",
        "string")
    ),
)

# System-table DataTypes (Logverz-Engine.json registry entries the
# platform itself writes): job status rows and quarantined-row records.
# Registered so their tables are describable/viewable like any dataset —
# ingest's metrics_table/quarantine_table sinks produce these shapes.
INVOCATIONS = DataType(
    name="Invocations",
    format="csv",
    schema=_schema(
        ("jobid", "string"), ("invocationid", "string"),
        ("updateunixtime", "long"), ("status", "string"),
        ("loggroup", "string"), ("logstream", "string"),
    ),
    views={"Default": ["jobid", "invocationid", "status", "logstream"]},
)


PROCESSINGERRORS = DataType(
    name="ProcessingErrors",
    format="csv",
    schema=_schema(
        ("jobid", "string"), ("invocationid", "string"),
        ("updateunixtime", "long"), ("errormessage", "string"),
        ("path", "string"), ("loggroup", "string"), ("logstream", "string"),
    ),
    views={"Default": ["jobid", "invocationid", "logstream", "errormessage"]},
)


REGISTRY: dict[str, DataType] = {
    dt.name: dt
    for dt in (
        VPCFLOW, CLOUDTRAIL, APPLICATIONLB, CLASSICLB, NETWORKLB,
        CLOUDFRONT, WINDOWSDEMOEVENTS, COSTDEMOAWS, COSTDEMOAZURE,
        INVOCATIONS, PROCESSINGERRORS,
    )
}


def get_datatype(name: str, custom_schema: str | None = None) -> DataType:
    """Resolve a DataType by name; ``Custom`` requires ``custom_schema``
    (the ad-hoc job-submitted schema string) plus optional reader options
    supplied by the caller."""
    if name == "Custom":
        if not custom_schema:
            raise ValueError("Custom DataType requires a schema string")
        return DataType(name="Custom", schema=parse_custom_schema(custom_schema))
    if name == "SetDataTypePlease":
        # The reference registry's placeholder entry is a prose string,
        # not a schema ("must change", Logverz-Engine.json) — jobs
        # submitted without picking a type fail loudly there and here.
        raise ValueError(
            "DataType 'SetDataTypePlease' is the registry placeholder — "
            "set the job's DataType to a real schema"
        )
    if name not in REGISTRY:
        raise KeyError(f"unknown DataType {name!r}; known: {sorted(REGISTRY)}")
    return REGISTRY[name]
