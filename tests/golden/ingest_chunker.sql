SELECT CAST(doc AS VARCHAR) AS doc, CAST(chunk_idx AS BIGINT) AS chunk_idx, CAST(text AS VARCHAR) AS text, CAST(page_num AS INTEGER) AS page_num, CAST(heading_path AS VARCHAR) AS heading_path, CAST(heading_level AS INTEGER) AS heading_level, CAST(chunk_type AS VARCHAR) AS chunk_type, CAST(sentence_count AS INTEGER) AS sentence_count, CAST(list_type AS VARCHAR) AS list_type, CAST(list_length AS INTEGER) AS list_length FROM (VALUES
  ('Brand#1', 0, 'small ring
cold ring
large plate
- cold anvil
blue widget
blue plate
new bolt
- cold anvil
blue rod
small plate
old gear
- cold widget
large widget
cold ring
blue rod
- new plate
blue plate
large bolt
cold plate
- hot bolt
small gizmo
hot bolt
blue ring
- hot rod
cold anvil
new ring
red gizmo
- new bolt
red widget
blue ring
large anvil
- small rod
new plate
old gizmo
old widget
- large rod
new gizmo
new widget
hot gear
- old widget
old bolt
large bolt
new ring
- small gear
red rod
large gear
large widget
- hot gear', 12, 'red rod', 0, 'text', 1, '', 0),
  ('Brand#10', 0, 'small widget
hot anvil
small plate
- blue rod
cold widget
red widget
hot rod
- red anvil
cold bolt
small rod
cold rod
- red gizmo
old gizmo
cold plate
old gizmo
- old anvil
hot bolt
small anvil
blue widget
- hot widget
blue anvil
blue anvil
old plate
- small anvil
blue anvil
large plate
red gear
- hot gear
cold gear
small rod
hot bolt
- cold bolt
small gear
blue widget
hot rod
- cold plate
new plate
hot rod
cold gear
- red gizmo
large rod
small widget
hot anvil
- red widget
small gear
small gear
hot ring
- new gear
old gizmo
red anvil', 13, 'small gear > old gizmo', 0, 'text', 1, '', 0),
  ('Brand#11', 0, 'cold bolt
blue gear
small bolt
- blue rod
small gear
small gizmo
small bolt
- hot ring
new gear
red rod
hot rod
- large anvil
old plate
cold gear
cold bolt
- hot rod
new bolt
blue gizmo
cold bolt
- red gizmo
red rod
cold gear
large plate
- large rod
small gizmo
old plate
blue anvil
- new rod
small ring
blue gizmo
blue plate
- blue ring
hot anvil
old bolt
red bolt
- old gizmo
old gear
large rod
blue gear
- red widget
large anvil
old rod
new widget
- red plate
hot widget
hot widget
blue anvil
- new rod', 12, 'hot widget', 0, 'text', 1, '', 0),
  ('Brand#12', 0, 'new bolt
hot widget
blue widget
- hot anvil
cold widget
old rod
red plate
- new gizmo
cold anvil
red ring
new gear
- large plate
cold gizmo
hot ring
large bolt
- blue ring
new widget
small anvil
hot rod
- large rod
red gear
hot anvil
hot ring
- new plate
old gizmo
red plate
new gear
- large bolt
large bolt
small widget
hot widget
- blue rod
new ring
cold plate
red bolt
- hot ring
new bolt
cold gear
red rod
- red bolt
red anvil
old gear
small plate
- blue bolt
new plate
new widget
cold plate
- old bolt
new gear
small rod
cold gizmo
- large widget
old widget
hot bolt
old rod
- red plate', 14, 'new plate > new gear > old widget', 0, 'text', 1, '', 0),
  ('Brand#13', 0, 'new gear
blue plate
red plate
- old bolt
blue ring
blue rod
blue ring
- small gear
old plate
large gear
cold rod
- small widget
small ring
small ring
hot bolt
- old rod
old plate
blue anvil
hot rod
- small widget
cold bolt
red widget
small ring
- small bolt
red rod
hot gear
blue bolt
- cold plate
cold rod
red anvil
large plate
- large rod
blue rod
cold gear
cold bolt
- red ring
cold gizmo
small ring
blue bolt
- new bolt
small gear
hot rod
hot bolt
- hot gear', 11, 'blue rod > cold gizmo > small gear', 0, 'text', 1, '', 0),
  ('Brand#14', 0, 'hot ring
old rod
old widget
- new anvil
cold widget
new bolt
old gizmo
- blue bolt
cold widget
new bolt
small gear
- old gizmo
red bolt
cold gear
hot anvil
- small gizmo
small gear
large gizmo
new plate
- red gizmo
new rod
new bolt
small gizmo
- red ring
old rod
red widget
cold bolt
- old widget
large bolt
new rod
small gizmo
- cold anvil
cold gear
old plate
blue ring
- cold plate
old bolt
small ring
blue anvil
- large ring
old rod
red plate
new rod
- hot gizmo
large plate
large rod
large widget
- cold bolt
hot plate
large widget
small gear
- large plate
old ring', 14, 'large plate > hot plate', 0, 'text', 1, '', 0),
  ('Brand#15', 0, 'old ring
small bolt
old anvil
- old anvil
small plate
cold ring
blue widget
- large bolt
blue widget
red ring
red widget
- hot ring
blue widget
small widget
blue widget
- hot widget
small gizmo
old widget
new ring
- blue bolt
large ring
cold ring
large gear
- cold anvil
red widget
new gizmo
blue widget
- hot widget
small ring
old bolt
small anvil
- hot widget
red ring
blue bolt
red gear
- blue bolt
old anvil
hot ring
blue gear
- cold gizmo
small rod
blue bolt
cold gizmo
- small ring
blue gear
red widget
new gizmo
- old rod
new gear
new widget
cold bolt', 13, 'blue gear > new gear', 0, 'text', 1, '', 0),
  ('Brand#16', 0, 'cold plate
cold gear
blue anvil
- hot gizmo
red anvil
blue ring
large gear
- hot gizmo
hot rod
large gear
large anvil
- small plate
old gear
large gear
old anvil
- cold widget
old anvil
old rod
hot rod
- new plate
new plate
old ring
hot plate
- hot rod
red anvil
old ring
small ring
- red rod
hot gizmo
small bolt
hot gizmo
- old ring
red anvil
red gizmo
small widget
- red rod
cold gizmo
small plate
small gear
- small gear
blue widget
small bolt
small anvil
- small widget
large gear
blue gizmo
small bolt
- red widget
hot rod
large ring
new bolt
- large anvil
red widget
red plate
red plate
- new widget
blue gizmo
cold rod
hot rod
- small gizmo', 15, 'blue gizmo', 0, 'text', 1, '', 0),
  ('Brand#17', 0, 'old bolt
hot plate
small ring
- new plate
small ring
old ring
hot gizmo
- hot gizmo
large gear
new widget
new anvil
- old gear
hot plate
small widget
hot gear
- new gear
new rod
new plate
new gear
- small plate
small bolt
red rod
hot rod
- large rod
small gizmo
hot anvil
old rod
- small anvil
large plate
blue widget
red anvil
- large rod
hot gizmo
new bolt
blue ring
- new rod
blue plate
hot bolt
hot ring
- large rod
large gear
large plate
red plate
- blue plate
large gizmo
red gizmo
old rod
- large plate
hot widget
red gizmo
new anvil
- cold ring
new bolt
large rod
large bolt
- small plate
small rod
cold widget
red widget
- large ring', 15, 'small rod', 0, 'text', 1, '', 0),
  ('Brand#18', 0, 'blue gizmo
red plate
small anvil
- blue anvil
hot rod
large gizmo
hot anvil
- cold anvil
large widget
old gizmo
cold widget
- red rod
large bolt
hot bolt
new widget
- blue rod
new plate
blue ring
small gizmo
- blue plate
red plate
cold ring
old ring
- hot gizmo
blue gizmo
large plate
large bolt
- cold bolt
cold bolt
red ring
old plate
- small widget
hot anvil
red ring
small widget
- red bolt
old ring
blue rod
old plate
- red rod
large rod
cold gizmo
blue gear
- small anvil
large bolt
new anvil
large rod
- new bolt', 12, 'large bolt', 0, 'text', 1, '', 0),
  ('Brand#19', 0, 'blue bolt
large plate
blue ring
- small widget
blue widget
new plate
large bolt
- red rod
blue ring
red plate
large widget
- blue rod
small ring
hot ring
old rod
- blue bolt
cold plate
new widget
large gear
- old gear
red gear
small ring
small gizmo
- red plate
small bolt
large gear
blue ring
- large plate
small gear
hot plate
blue gear
- red anvil
old widget
new bolt
red widget
- blue gizmo
hot anvil
old bolt
cold gizmo
- blue bolt
large gizmo
old bolt
small plate
- red ring
new rod
red bolt
hot gizmo
- blue plate
blue ring
small rod
old rod
- small gizmo
red bolt
red gear
large gear
- cold bolt
large gear
blue gizmo
blue anvil
- hot rod
red anvil
red rod
old gear
- large gizmo', 16, 'large gear > red anvil', 0, 'text', 1, '', 0),
  ('Brand#2', 0, 'blue gear
large widget
new gizmo
- red gear
red bolt
red widget
red gizmo
- large ring
blue gear
large gizmo
cold ring
- old rod
cold ring
small gear
large bolt
- small ring
red plate
large gizmo
small bolt
- red widget
old widget
large gizmo
cold anvil
- old bolt
hot plate
blue gear
red bolt
- blue ring
cold rod
new gear
cold widget
- large gizmo
large bolt
small gizmo
large rod
- red ring
hot gear
old gizmo
new gizmo
- cold anvil
new bolt
blue plate
large rod
- hot anvil
blue rod
new gizmo
blue gear
- cold ring
large anvil
blue anvil
blue plate
- cold ring
hot gizmo
blue rod
blue bolt
- large bolt
blue rod
red bolt
cold anvil
- hot rod
hot gear
small anvil
new gear
- new gear', 16, 'blue rod > hot gear', 0, 'text', 1, '', 0),
  ('Brand#20', 0, 'old gear
hot plate
cold ring
- old ring
old rod
new ring
new bolt
- new anvil
blue bolt
old ring
cold gear
- new widget
small gear
cold gear
hot gizmo
- hot widget
cold rod
blue widget
small bolt
- hot anvil
old bolt
small plate
new anvil
- large anvil
old bolt
old rod
cold bolt
- old rod
old rod
new gizmo
hot gizmo
- small widget
old widget
large anvil
hot ring
- small rod
blue ring
hot ring
cold bolt
- hot plate
old widget
old plate
large gizmo
- blue gear
small widget
large rod
hot widget
- blue gizmo
cold anvil
small ring
old gear
- red ring', 13, 'small widget > cold anvil', 0, 'text', 1, '', 0),
  ('Brand#21', 0, 'cold ring
old rod
large ring
- large rod
old ring
cold rod
blue gizmo
- small gear
old bolt
new anvil
blue rod
- blue gizmo
new rod
small rod
blue gizmo
- red ring
small widget
hot plate
large gear
- red gear
new anvil
blue gear
cold gear
- blue widget
old gizmo
new ring
large rod
- cold rod
old anvil
old widget
blue anvil
- small gear
blue widget
blue plate
small widget
- blue bolt
old anvil
blue ring
hot gizmo
- blue bolt
hot widget
old bolt
red widget
- hot ring
cold rod
hot gizmo
large bolt
- blue gear
red ring
cold gear
cold gear
- large gear
new bolt
small gear
small ring
- red rod', 14, 'cold rod > red ring > new bolt', 0, 'text', 1, '', 0),
  ('Brand#22', 0, 'red rod
blue widget
red plate
- new bolt
old rod
hot bolt
cold plate
- cold rod
old anvil
cold gear
blue ring
- blue gear
blue gizmo
new bolt
cold widget
- hot bolt
old plate
new rod
red widget
- small gear
cold bolt
hot gear
small plate
- large plate
new gizmo
red rod
hot rod
- red gear
large plate
red rod
large plate
- blue gear
cold gizmo
cold anvil
cold anvil
- hot gizmo
new bolt
old ring
hot gizmo
- large gear
blue plate
small widget
small gizmo
- blue plate
new gear
large widget
hot gear
- cold plate
blue plate
hot anvil
small anvil
- old rod', 13, 'new gear > blue plate', 0, 'text', 1, '', 0),
  ('Brand#23', 0, 'small widget
blue anvil
cold gizmo
- cold rod
old bolt
large rod
new bolt
- new rod
red widget
large ring
hot ring
- small plate
red ring
large ring
cold rod
- cold gizmo
new widget
blue ring
large gear
- new ring
old bolt
hot ring
blue plate
- small rod
new widget
large plate
red bolt
- small anvil
old gizmo
cold gear
new ring
- hot widget
hot gizmo
small gear
red gear
- old bolt
cold ring
new bolt
old rod
- hot gizmo
old ring
red gear
small anvil
- small gizmo
small ring
old anvil
large gizmo
- red anvil', 12, 'small ring', 0, 'text', 1, '', 0),
  ('Brand#24', 0, 'hot gizmo
red anvil
new plate
- new ring
blue anvil
blue gear
small anvil
- new gizmo
small anvil
cold widget
small gear
- old anvil
cold gear
red widget
new widget
- red gizmo
large ring
hot plate
old gizmo
- new plate
cold ring
small anvil
new widget
- hot plate
red plate
large gear
small plate
- new ring
new gear
blue gear
old gear
- old bolt
large gizmo
new ring
large gizmo
- old ring
large gear
blue anvil
large bolt
- blue gizmo
hot ring
hot rod
hot anvil', 11, 'large gizmo > large gear > hot ring', 0, 'text', 1, '', 0),
  ('Brand#25', 0, 'old plate
new gear
red plate
- large gear
old bolt
blue plate
new ring
- blue gear
hot ring
red widget
small gear
- red bolt
large rod
old ring
hot widget
- red anvil
large plate
new anvil
hot ring
- cold bolt
large ring
cold bolt
old rod
- cold bolt
hot gear
small rod
old widget
- old rod
new bolt
hot bolt
new gear
- hot bolt
cold rod
hot gizmo
large widget
- small rod
red gizmo
old ring
hot plate
- hot widget
old gizmo
blue rod
old ring
- large plate
hot anvil
hot rod
old gear
- blue anvil
red gear
red plate
red plate
- old plate
blue ring
red gear
new bolt
- blue ring
large rod
old anvil', 15, 'large rod', 0, 'text', 1, '', 0),
  ('Brand#3', 0, 'large plate
blue ring
old ring
- small widget
small bolt
small rod
cold widget
- new widget
red plate
red rod
hot gizmo
- blue anvil
hot gear
old bolt
red gizmo
- new widget
red gear
new gear
red rod
- new anvil
blue gizmo
small bolt
new bolt
- hot plate
small rod
blue plate
hot widget
- blue bolt
new gear
large widget
large ring
- new gear
cold rod
blue ring
red widget
- hot bolt
blue widget
new anvil
red plate
- cold gizmo
small widget
large bolt
cold gear
- hot bolt
blue gizmo
small plate
blue rod
- small gizmo
large gear
red gear
new ring
- small bolt
red ring
old rod
small widget
- new ring', 14, 'blue gizmo > large gear > red ring', 0, 'text', 1, '', 0),
  ('Brand#4', 0, 'blue rod
red gear
new ring
- hot gear
small plate
cold gear
new rod
- red gizmo
large bolt
hot widget
old gear
- hot widget
new gizmo
new gizmo
red rod
- small bolt
small gizmo
large gizmo
hot gizmo
- small anvil
red gear
small plate
large plate
- cold anvil
new ring
large rod
blue bolt
- hot plate
large widget
large gear
old gear
- cold anvil
new gear
blue widget
cold anvil
- small bolt
large anvil
blue ring
small bolt
- small gizmo
hot bolt
red gizmo
blue widget
- hot bolt
red ring
cold widget
large gear
- old widget
blue widget
new gear
cold anvil
- hot rod
hot widget
small gear
small ring
- cold gizmo
blue ring
small gear
blue gizmo
- blue gear
new rod
cold gizmo
old rod
- hot anvil', 16, 'blue ring > new rod', 0, 'text', 1, '', 0),
  ('Brand#5', 0, 'old gear
large gear
new rod
- new anvil
new bolt
red gizmo
small gizmo
- red rod
red plate
hot ring
blue bolt
- hot plate
new widget
small bolt
red widget
- red plate
red anvil
large anvil
large bolt
- hot bolt
hot plate
blue rod
old gear
- small ring
hot ring
cold gear
old bolt
- hot plate
new bolt
blue bolt
small bolt
- old widget
cold rod
small ring
old ring
- red plate
new gear
new plate
hot gizmo
- small anvil
hot ring
new anvil
old rod
- blue gear
blue anvil
cold gizmo
large gizmo
- old anvil
large gear', 13, 'blue anvil', 0, 'text', 1, '', 0),
  ('Brand#6', 0, 'hot bolt
hot ring
large gizmo
- blue bolt
large rod
hot bolt
large ring
- red ring
new gear
old plate
hot ring
- small widget
old ring
small widget
new widget
- old ring
cold rod
new anvil
cold gizmo
- blue gizmo
blue gear
new anvil
large bolt
- cold gear
new anvil
old anvil
small gear
- red plate
small gear
hot ring
new gear
- large plate
small bolt
small gizmo
red ring
- small gizmo
large ring
large anvil
red ring
- cold gizmo
cold plate', 11, 'small bolt > large ring', 0, 'text', 1, '', 0),
  ('Brand#7', 0, 'blue gizmo
old gizmo
hot anvil
- old widget
cold plate
small gear
small widget
- red plate
new rod
red anvil
large plate
- red anvil
red plate
hot anvil
hot rod
- cold gizmo
red plate
blue gear
old gizmo
- old rod
hot ring
new ring
old plate
- blue ring
old gizmo
large gizmo
blue rod
- cold anvil
large rod
cold anvil
hot ring
- new widget
cold gizmo
large widget
red gizmo
- new anvil
large gizmo
old anvil
red gizmo
- hot plate
new rod
red anvil
red plate
- old anvil
cold gear
hot bolt
large ring
- old rod
hot bolt
blue gizmo
red gear
- red gear', 13, 'cold gear > hot bolt', 0, 'text', 1, '', 0),
  ('Brand#8', 0, 'small widget
red anvil
red ring
- hot ring
small ring
hot rod
new bolt
- red gizmo
old ring
red gizmo
red plate
- old rod
hot plate
small widget
blue plate
- large bolt
old gear
red widget
cold bolt
- hot ring
red gear
cold plate
red rod
- hot gear
hot gear
hot plate
red plate
- blue plate
red widget
large rod
large gizmo
- large ring
hot plate
small ring
blue gizmo
- large rod
small plate
large plate
cold plate
- red rod
old anvil
large widget
old ring
- large bolt
blue widget
large gizmo
cold widget
- cold anvil
new ring
red plate
hot rod
- red plate
blue gizmo
cold gear
old widget
- small ring
new gizmo
blue anvil
cold gizmo
- red plate', 15, 'new gizmo', 0, 'text', 1, '', 0),
  ('Brand#9', 0, 'red ring
hot bolt
red bolt
- new plate
old widget
hot gizmo
small ring
- small bolt
blue bolt
large ring
small anvil
- new gizmo
small anvil
small bolt
blue plate
- hot rod
small gizmo
small widget
new gear
- red rod
large ring
old gear
hot gizmo
- old bolt
hot anvil
new anvil
new anvil
- large gear
small widget
small anvil
new plate
- hot bolt
large rod
old gizmo
new bolt
- cold bolt
blue gizmo
blue widget
small widget
- large bolt
cold widget
large ring
red rod
- red ring
cold gear
old rod
large plate
- hot gear
small plate
large bolt
large widget
- blue gear
blue gear
red ring
old bolt
- hot widget
old ring
hot rod
cold bolt', 15, 'old ring', 0, 'text', 1, '', 0)
) AS golden(doc, chunk_idx, text, page_num, heading_path, heading_level, chunk_type, sentence_count, list_type, list_length)
