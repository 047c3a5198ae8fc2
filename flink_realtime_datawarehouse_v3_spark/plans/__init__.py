"""DWD / DWS pipeline plans.

Each reference Flink job is re-expressed as a pure ``DataFrame ->
DataFrame`` function (batch/stream duality: the same function body runs
under batch for oracle parity and under Structured Streaming via
``foreachBatch`` / ``availableNow``).

Modules:
- ``dwd_simple``  : single-table CDC filters (tool/interaction/user jobs)
- ``dwd_trade``   : trade-domain joins (pre-process, cart add, cancel,
                    pay-suc, refund, refund-pay-suc)
- ``dwd_traffic`` : log split, UV dedup, jump (bounce) detection
- ``dws``         : windowed aggregation jobs (traffic/user/trade)
"""
