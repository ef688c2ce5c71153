SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(n AS BIGINT) AS n, CAST(approx_users AS BIGINT) AS approx_users, CAST(approx_p50 AS DOUBLE) AS approx_p50, CAST(approx_p95 AS DOUBLE) AS approx_p95 FROM (VALUES
  ('click', 210, 15, 33.19, 148.12),
  ('error', 201, 15, 33.55, 124.6),
  ('purchase', 202, 15, 35.62, 140.64),
  ('signup', 199, 15, 37.9, 156.01),
  ('view', 188, 15, 37.11, 127.11)
) AS golden(event_type, n, approx_users, approx_p50, approx_p95)
