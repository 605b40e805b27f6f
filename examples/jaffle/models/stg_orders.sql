SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
       CAST(o_orderdate AS DATE) AS order_date
FROM {{ source('warehouse', 'orders') }}
