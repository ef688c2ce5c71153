SELECT CAST(statement AS VARCHAR) AS statement, CAST(sources AS VARCHAR) AS sources, CAST(confidence AS DOUBLE) AS confidence FROM (VALUES
  ('Re ''how to merge fast table join'': the fast key order sort table scan merge part window small hash scan join order ', '1', 0.16639344262295083),
  ('Re ''how to merge fast table join'': small big order scan fast sort a value stream fast join column big line value va', '2', 0.16488903985507247),
  ('Re ''how to merge fast table join'': spark group query row data slow small filter customer line the batch value merge', '3', 0.16048387096774197),
  ('Re ''how to merge fast table join'': join a filter window row join stream customer data group sort merge fast row key', '4', 0.16031746031746033),
  ('Re ''how to merge fast table join'': fast column table row filter key fast agg query order join small the customer sl', '5', 0.16015625000000003)
) AS golden(statement, sources, confidence)
