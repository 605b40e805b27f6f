SELECT method, fee_bps, fee_bps / 10000.0 AS fee_rate
FROM {{ ref('payment_methods') }}
