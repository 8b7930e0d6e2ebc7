"""The reference's full object registry re-expressed as TableSpecs.

One entry per registered object in the reference's declarative registry
(configs/salesforce_objects.py:15-195, 23 objects): same projection
fields, required-column contracts, group keys and metric vocabulary, so
a user of the reference can run every configured aggregation through
this engine unchanged (via sources.salesforce.extract_object +
flows.pipeline.run_pipeline).

The one special case: Event's ``__DURATION_HOURS__`` pseudo-metric
(configs/...py:71, computed at tasks/process.py:89-97) becomes an
explicit derived expression — same output columns
(sum_duration_hours / avg_duration_hours), no magic token.
"""

from __future__ import annotations

from salesforce_prefect_etl_pipeline_spark.specs import TableSpec

#: tolerant timestamp-difference in hours, null-filled (process.py:94-95)
_DURATION_EXPR = (
    "coalesce((cast(try_to_timestamp(EndDateTime) as double)"
    " - cast(try_to_timestamp(StartDateTime) as double)) / 3600.0, 0.0)"
)


def _spec(name, fields, required, group_by, metrics, derived=None):
    return TableSpec(
        name=name,
        table=name,
        fields=tuple(fields),
        required_cols=tuple(required),
        group_by=tuple(group_by),
        metrics={c: tuple(ops) for c, ops in metrics.items()},
        derived=derived or {},
    )


REFERENCE_SPECS: dict[str, TableSpec] = {
    s.name: s
    for s in [
        # ---- Core CRM ----
        _spec(
            "Account",
            ["Id", "Name", "Phone", "Website", "BillingCity", "BillingState", "Industry", "AnnualRevenue"],
            ["Id", "Name"], ["BillingState"],
            {"AnnualRevenue": ["sum", "mean", "count"]},
        ),
        _spec(
            "Contact",
            ["Id", "FirstName", "LastName", "Email", "Phone", "MailingCity", "MailingState", "AccountId"],
            ["Id", "LastName"], ["MailingState"], {"Id": ["count"]},
        ),
        _spec(
            "Lead",
            ["Id", "FirstName", "LastName", "Company", "Status", "LeadSource", "Email", "Phone", "City", "State"],
            ["Id", "Status"], ["Status", "LeadSource"], {"Id": ["count"]},
        ),
        _spec(
            "Opportunity",
            ["Id", "Name", "StageName", "Amount", "CloseDate", "OwnerId", "AccountId", "Type"],
            ["Id", "StageName"], ["StageName"],
            {"Amount": ["sum", "mean", "count"]},
        ),
        _spec(
            "OpportunityLineItem",
            ["Id", "OpportunityId", "Product2Id", "Quantity", "UnitPrice", "TotalPrice"],
            ["Id", "OpportunityId"], ["Product2Id"],
            {"Quantity": ["sum"], "UnitPrice": ["mean"], "TotalPrice": ["sum", "count"]},
        ),
        _spec(
            "Case",
            ["Id", "CaseNumber", "Status", "Priority", "Origin", "AccountId", "ContactId", "OwnerId"],
            ["Id", "Status"], ["Status", "Priority"], {"Id": ["count"]},
        ),
        _spec(
            "Task",
            ["Id", "Subject", "Status", "Priority", "OwnerId", "WhatId", "WhoId", "ActivityDate"],
            ["Id"], ["Status", "Priority"], {"Id": ["count"]},
        ),
        _spec(
            "Event",
            ["Id", "Subject", "StartDateTime", "EndDateTime", "OwnerId", "WhatId", "Location"],
            ["Id"], ["OwnerId"],
            {"duration_hours": ["sum", "mean", "count"]},
            derived={"duration_hours": _DURATION_EXPR},
        ),
        _spec(
            "Campaign",
            ["Id", "Name", "Status", "Type", "StartDate", "EndDate", "BudgetedCost", "ActualCost"],
            ["Id", "Name"], ["Status", "Type"],
            {"BudgetedCost": ["sum"], "ActualCost": ["sum", "count"]},
        ),
        _spec(
            "CampaignMember",
            ["Id", "CampaignId", "ContactId", "LeadId", "Status"],
            ["Id", "CampaignId"], ["Status"], {"Id": ["count"]},
        ),
        # ---- Catalog / Pricing ----
        _spec(
            "Product2",
            ["Id", "Name", "ProductCode", "Family", "IsActive"],
            ["Id", "Name"], ["Family", "IsActive"], {"Id": ["count"]},
        ),
        _spec(
            "Pricebook2",
            ["Id", "Name", "IsActive"],
            ["Id", "Name"], ["IsActive"], {"Id": ["count"]},
        ),
        _spec(
            "PricebookEntry",
            ["Id", "Pricebook2Id", "Product2Id", "UnitPrice", "IsActive", "UseStandardPrice"],
            ["Id", "Product2Id"], ["Pricebook2Id", "IsActive"],
            {"UnitPrice": ["mean", "count"]},
        ),
        # ---- Orders / Quotes / Contracts / Assets ----
        _spec(
            "Order",
            ["Id", "AccountId", "Status", "TotalAmount", "EffectiveDate", "OwnerId"],
            ["Id", "Status"], ["Status"],
            {"TotalAmount": ["sum", "mean", "count"]},
        ),
        _spec(
            "OrderItem",
            ["Id", "OrderId", "Product2Id", "Quantity", "UnitPrice", "TotalPrice"],
            ["Id", "OrderId"], ["Product2Id"],
            {"Quantity": ["sum"], "UnitPrice": ["mean"], "TotalPrice": ["sum", "count"]},
        ),
        _spec(
            "Quote",
            ["Id", "Name", "OpportunityId", "Status", "GrandTotal", "ExpirationDate"],
            ["Id", "Status"], ["Status"],
            {"GrandTotal": ["sum", "mean", "count"]},
        ),
        _spec(
            "QuoteLineItem",
            ["Id", "QuoteId", "Product2Id", "Quantity", "UnitPrice", "TotalPrice"],
            ["Id", "QuoteId"], ["Product2Id"],
            {"Quantity": ["sum"], "UnitPrice": ["mean"], "TotalPrice": ["sum", "count"]},
        ),
        _spec(
            "Contract",
            ["Id", "AccountId", "Status", "StartDate", "EndDate", "OwnerId"],
            ["Id", "Status"], ["Status"], {"Id": ["count"]},
        ),
        _spec(
            "Asset",
            ["Id", "AccountId", "ContactId", "Product2Id", "Status", "InstallDate"],
            ["Id", "Status"], ["Status"], {"Id": ["count"]},
        ),
        # ---- Files / Notes ----
        _spec(
            "Note",
            ["Id", "Title", "IsPrivate", "OwnerId", "ParentId"],
            ["Id", "Title"], ["IsPrivate"], {"Id": ["count"]},
        ),
        _spec(
            "ContentDocument",
            ["Id", "Title", "FileType", "LatestPublishedVersionId", "OwnerId"],
            ["Id", "Title"], ["FileType"], {"Id": ["count"]},
        ),
        _spec(
            "ContentVersion",
            ["Id", "Title", "FileExtension", "VersionDataSize", "ContentDocumentId"],
            ["Id", "Title"], ["FileExtension"],
            {"VersionDataSize": ["sum", "mean", "count"]},
        ),
        # ---- Admin ----
        _spec(
            "User",
            ["Id", "Name", "Username", "Email", "IsActive", "Alias", "TimeZoneSidKey"],
            ["Id", "Name"], ["IsActive", "TimeZoneSidKey"], {"Id": ["count"]},
        ),
    ]
}
