SELECT o_orderkey, o_custkey, o_totalprice
FROM {{ source('warehouse', 'orders') }}
{% if is_incremental() %}
WHERE o_orderkey > (SELECT max(o_orderkey) FROM {{ this }})
{% endif %}
